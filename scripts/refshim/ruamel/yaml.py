"""Minimal ruamel.yaml shim (PyYAML-backed) sufficient to import and run
the reference chsimpy for golden-trace generation."""
import yaml as _py


# one shared Loader/Dumper pair for every YAML() instance: ruamel's
# register_class adds to the representer CLASS registry, so classes
# registered via one instance (e.g. Parameters in parameters.py) are
# visible when another instance (Solution's) dumps them as nested values
class _SharedLoader(_py.SafeLoader):
    pass


class _SharedDumper(_py.SafeDumper):
    pass


class YAML:
    def __init__(self, typ='safe'):
        _Loader = _SharedLoader
        _Dumper = _SharedDumper
        self.Loader = _Loader
        self.Dumper = _Dumper

        class _Constructor:
            def add_constructor(c, tag, fn):
                def wrap(loader, node):
                    class _Shim:
                        def construct_scalar(self, n):
                            return loader.construct_scalar(n)
                    return fn(_Shim(), node)
                _Loader.add_constructor(tag, wrap)
        self.constructor = _Constructor()

        class _Representer:
            def add_representer(r, cls, fn):
                pass
        self.representer = _Representer()

    def register_class(self, cls):
        tag = getattr(cls, 'yaml_tag', '!' + cls.__name__)
        if hasattr(cls, 'to_yaml'):
            class _Rep:
                def represent_mapping(self, t, mapping):
                    return _the_dumper.represent_mapping(t, mapping)
            def _repr(dumper, data):
                global _the_dumper
                _the_dumper = dumper
                return cls.to_yaml(_Rep(), data)
            self.Dumper.add_representer(cls, _repr)
        def _constr(loader, node):
            return loader.construct_mapping(node, deep=True)
        self.Loader.add_constructor(tag, _constr)
        return cls

    def dump(self, obj, stream):
        _py.dump(obj, stream, Dumper=self.Dumper,
                 default_flow_style=False, explicit_start=True)

    def load(self, stream):
        return _py.load(stream, Loader=self.Loader)
