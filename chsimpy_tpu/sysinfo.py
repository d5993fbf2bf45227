"""System/device info and misc host utilities.

Reference equivalents: ``chsimpy/utils.py:107-140,184-242``.  Extended with
the JAX device/topology snapshot (TPU platform, chip count, mesh) that the
reference (CPU-only) has no notion of.
"""

from __future__ import annotations

import os
import platform
import sys
import time
from datetime import datetime


def get_current_localtime() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S %Z", time.localtime())


def get_or_create_file_id(file_id):
    if file_id == 'auto' or file_id is None or file_id == '' \
            or str(file_id).lower() == 'none':
        return datetime.now().strftime('%d%m%Y-%H%M%S')
    return file_id


def get_number_physical_cores() -> int:
    import psutil
    return psutil.cpu_count(logical=False)


def get_device_info() -> list:
    """TPU/accelerator topology snapshot."""
    try:
        import jax
        devs = jax.devices()
        return [
            f"jax-backend, {jax.default_backend()}",
            f"device-count, {jax.device_count()}",
            f"local-device-count, {jax.local_device_count()}",
            f"process-count, {jax.process_count()}",
            f"device-kind, {devs[0].device_kind if devs else 'none'}",
        ]
    except Exception as e:  # pragma: no cover - info only
        return [f"jax-backend, unavailable ({e})"]


def get_system_info() -> list:
    import psutil
    from .version import __version__
    uname = platform.uname()
    try:
        cpufreq = psutil.cpu_freq()
        fmin, fmax, fcur = cpufreq.min, cpufreq.max, cpufreq.current
    except Exception:
        fmin = fmax = fcur = 0.0
    sysinfo = [
        f"system, {uname.system}",
        f"nodename, {uname.node}",
        f"kernel-release, {uname.release}",
        f"kernel-version, {uname.version}",
        f"machine, {uname.machine}",
        f"cores_phys, {psutil.cpu_count(logical=False)}",
        f"cores_total, {psutil.cpu_count(logical=True)}",
        f"cpufreq_min, {fmin:.2f}",
        f"cpufreq_max, {fmax:.2f}",
        f"cpufreq_current, {fcur:.2f}",
        f"localtime, {get_current_localtime()}",
        f"argv, '{' '.join(sys.argv)}'",
        f"chsimpy-tpu-version, {__version__}",
    ]
    return sysinfo + get_device_info()


def get_mem_usage() -> str:
    import psutil
    process = psutil.Process(os.getpid())
    return f"{process.memory_info().rss / 1048576:.2f}MiB"


def get_mem_usage_all() -> str:
    try:
        import resource
        kib = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
               + resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss)
        return f"{kib / 1024:0.2f}MiB"
    except ImportError:
        return ""


def sec_to_min_if(value, t=60):
    if value > t:
        return str(round(value / 60.0, 1)) + 'min'
    return str(round(value, 1)) + 's'


def get_int_max_value() -> int:
    import numpy as np
    return np.iinfo(np.intp).max


def vars_to_list(obj) -> list:
    attribs = []
    for x in dir(obj):
        if x.startswith('_') or not hasattr(obj, x):
            continue
        v = getattr(obj, x)
        if callable(v):
            continue
        attribs.append(f"{x}, {v}")
    return attribs


def is_notebook() -> bool:
    try:
        from IPython import get_ipython
    except ImportError:
        return False
    try:
        shell = get_ipython().__class__.__name__
        return shell == 'ZMQInteractiveShell'
    except NameError:
        return False
