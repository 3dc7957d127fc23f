"""Solve-result reporting.

The reference returns a six-field namedtuple from every solver (reference:
src/krylov/_helpers.py:93-98).  We keep the identical public surface but back
it with two representations:

* ``Info`` — the host-side result: ``resnorms`` is a dense float ndarray of
  shape ``(numsteps + 1, *b.shape[1:])`` (indexable like the reference's list),
  ``success`` is a plain bool, ``numsteps`` a plain int.
* ``DeviceInfo`` — the on-device pytree produced by the compiled
  (``lax.while_loop``) driver when a solve is traced inside user ``jit``:
  ``resnorms`` is the fixed ``(maxiter + 1, ...)`` buffer and ``numsteps`` the
  valid length minus one.  ``materialize()`` converts to ``Info`` on host.
"""

from collections import namedtuple

import numpy as np

Info = namedtuple(
    "IterInfo",
    ["success", "xk", "numsteps", "resnorms", "num_operations", "arnoldi"],
    defaults=(None, None),
)


DeviceInfo = namedtuple(
    "DeviceIterInfo",
    ["success", "xk", "numsteps", "resnorms", "num_operations", "arnoldi"],
    defaults=(None, None),
)


def materialize_info(dinfo: DeviceInfo) -> Info:
    """Convert a DeviceInfo (fixed-size resnorm buffer) to a host Info."""
    numsteps = int(dinfo.numsteps)
    resnorms = np.asarray(dinfo.resnorms)[: numsteps + 1]
    return Info(
        bool(dinfo.success),
        dinfo.xk,
        numsteps,
        resnorms,
        dinfo.num_operations,
        dinfo.arnoldi,
    )
