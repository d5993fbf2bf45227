"""CSV (optionally bz2-compressed) matrix import/export.

File formats are identical to the reference (``chsimpy/utils.py:79-90``) so
exported fields can be diffed/compared bit-for-bit against reference runs:
plain CSV via ``np.savetxt(fmt='%s')`` (repr-exact float64 round-trip), bz2
CSV via pandas.
"""

from __future__ import annotations

import numpy as np


def csv_export_matrix(V, fname: str) -> None:
    V = np.asarray(V)
    if fname.endswith('bz2'):
        import pandas as pd
        pd.DataFrame(V).to_csv(fname, index=False, header=None, sep=',',
                               compression='bz2')
    else:
        np.savetxt(fname, V, delimiter=',', fmt='%s')


def csv_import_matrix(fname: str) -> np.ndarray:
    if fname.endswith('bz2'):
        import pandas as pd
        return pd.read_csv(fname, sep=',', header=None,
                           compression='bz2').values
    return np.loadtxt(fname, delimiter=',')


def csv_export_list(fname: str, lines) -> None:
    with open(fname, 'w') as f:
        if isinstance(lines, str):
            f.write(lines)
        else:
            f.writelines(lines)


def validate_solution_files(file_new: str, file_truth: str) -> bool:
    """Line-diff two solution files (reference ``utils.py:94-104``)."""
    import difflib
    with open(file_new) as fnew, open(file_truth) as ftruth:
        diff = difflib.ndiff(fnew.readlines(), ftruth.readlines())
    delta = ''.join(x[2:] for x in diff if x.startswith('- '))
    return not delta
