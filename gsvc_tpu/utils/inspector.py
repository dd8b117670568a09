"""Debug tensor inspector (parity: utils/inspector.py:9-30)."""

from __future__ import annotations

import inspect

import numpy as np


def check_tensor(x, name: str | None = None) -> str:
    """Print shape/dtype/mean/std/min/max/NaN count of an array.

    The caller's argument expression is used as the label when ``name``
    is not given (same introspection trick as the reference)."""
    if name is None:
        frame = inspect.currentframe().f_back
        ctx = inspect.getframeinfo(frame).code_context
        if ctx:
            call = ctx[0].strip()
            lo = call.find("check_tensor(") + len("check_tensor(")
            hi = call.rfind(")")
            name = call[lo:hi] or "tensor"
        else:
            name = "tensor"
    a = np.asarray(x)
    n_nan = int(np.isnan(a).sum()) if np.issubdtype(a.dtype, np.floating) \
        else 0
    msg = (f"{name}: shape={a.shape} dtype={a.dtype} "
           f"mean={a.mean():.6g} std={a.std():.6g} "
           f"min={a.min():.6g} max={a.max():.6g} nan={n_nan}")
    print(msg)
    return msg
