"""RData -> .mat conversion (the reference's nips2016/loadRData.py).

The reference converts R data files to numpy dicts via rpy2
(loadRData.py:8-25); rpy2 and R are unavailable here, so this module
gates the rpy2 path behind a clear error and additionally supports
``pyreadr`` when installed.  The output contract matches the reference:
a dict of numpy arrays saved with ``scipy.io.savemat``.
"""

from __future__ import annotations

import numpy as np
import scipy.io

__all__ = ["rdata_to_dict", "rdata_to_mat"]


def rdata_to_dict(path: str) -> dict:
    """Load an .RData/.rds file into a dict of numpy arrays."""
    try:
        import pyreadr  # lightweight, pure-python-ish reader
    except ImportError:
        pyreadr = None
    if pyreadr is not None:
        result = pyreadr.read_r(path)
        return {k: np.asarray(v) for k, v in result.items()}

    try:
        import rpy2.robjects as robjects
    except ImportError as e:
        raise RuntimeError(
            "converting RData requires pyreadr or rpy2+R, neither of which "
            "is installed in this environment; convert the file elsewhere "
            "with scipy-compatible output (a dict of arrays in a .mat)"
        ) from e
    robjects.r["load"](path)
    out = {}
    for name in robjects.r["ls"]():
        out[str(name)] = np.asarray(robjects.r[name])
    return out


def rdata_to_mat(rdata_path: str, mat_path: str) -> dict:
    """Convert an RData file to .mat (loadRData.py:13-25 semantics)."""
    data = rdata_to_dict(rdata_path)
    scipy.io.savemat(mat_path, data)
    return data
