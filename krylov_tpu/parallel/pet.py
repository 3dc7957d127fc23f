"""Row-partitioned PET operator: general sparsity at TPU speed, sharded.

Each shard owns a contiguous row slab of the matrix, preprocessed
host-side into its own PET chunk arrays (:mod:`krylov_tpu.ops.pallas_spmv`);
the iterate is ``all_gather``-ed over the mesh axis and the local slab
SpMV runs the Pallas page-ELL kernel.  The adjoint uses per-shard PETs of
the conjugate-transpose COLUMN slabs, whose local results are exactly the
shard's owned rows (no reduction needed).  No reference counterpart
(SURVEY.md §2.3): this is the distribution story for the reference's
implicit scipy-CSR operators.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.tree_util import register_pytree_node_class

from ..ops import pallas_spmv as ps
from .mesh import ROWS

_ARR = ("ent", "dat", "meta", "meta_v")


def _pad_chunks(pet, nchunks):
    """Pad a shard's PET to ``nchunks`` with no-op chunks (append-only:
    the padding chunks accumulate zeros into the last group touched)."""
    cur = pet["nchunks"]
    if cur == nchunks:
        return pet
    extra = nchunks - cur
    lc = pet["lc"]
    last_group = int(np.asarray(pet["meta"])[-1]) & 0xFFFF
    ent = jnp.concatenate(
        [pet["ent"], jnp.zeros((extra * lc, 128), jnp.int8)], axis=0
    )
    dat = jnp.concatenate(
        [pet["dat"],
         jnp.zeros((extra * lc, 128), pet["dat"].dtype)], axis=0
    )
    meta = jnp.concatenate(
        [pet["meta"], jnp.full((extra,), last_group, jnp.int32)], axis=0
    )
    meta_v = jnp.concatenate(
        [pet["meta_v"], jnp.zeros((extra * 8, 128), jnp.int32)], axis=0
    )
    return dict(pet, ent=ent, dat=dat, meta=meta, meta_v=meta_v,
                nchunks=nchunks)


class PETPartition(dict):
    """Marker type: host-side PET partition accepted by ``sharded_solve``."""


def partition_pet(sp, n_shards, data_dtype=None, reorder=None):
    """Host-side partition of a scipy sparse matrix into per-shard PETs.

    ``reorder``: ``"rcm"`` partitions the symmetric reverse-Cuthill–McKee
    reordering of the matrix (up to 147x PET fill on badly ordered
    meshes — see :func:`krylov_tpu.ops.pallas_spmv.rcm_permutation`),
    ``"auto"`` reorders only when a sampled fill estimate says it pays
    >=2x, an index array uses that permutation.  ``sharded_solve``
    permutes the vectors once per solve and un-permutes the returned
    iterate, so callers keep user-order semantics with zero
    per-iteration cost.  RCM also localizes columns near the diagonal,
    which shrinks the halo the shards must exchange.

    Returns stacked device arrays (leading shard axis) + static geometry.
    A row count that does not divide into the shards is padded with
    unit-diagonal rows (padded vector entries stay exactly zero, so
    trajectories match the unpadded problem, while diagonal-dividing
    solvers and M_factory smoothers see a 1, not a 0/0 — same scheme as
    :func:`~krylov_tpu.parallel.csr.partition_csr`);
    ``sharded_solve`` pads the vectors and slices the solution back.
    """
    import numpy as np
    import scipy.sparse

    sp = scipy.sparse.csr_matrix(sp)

    from ..ops.pallas_spmv import resolve_reorder

    perm_np = resolve_reorder(sp, reorder, metric="fill")
    if perm_np is not None:
        sp = sp[perm_np][:, perm_np].tocsr()

    n, m = sp.shape
    pad = (-n) % n_shards
    if pad:
        sp = sp.copy()
        sp.resize((n + pad, m + pad))
        eye_pad = scipy.sparse.csr_matrix(
            (
                np.ones(pad, sp.dtype),
                (np.arange(n, n + pad), np.arange(m, m + pad)),
            ),
            shape=sp.shape,
        )
        sp = (sp + eye_pad).tocsr()
        n, m = sp.shape
    n_local = n // n_shards

    # all shards must share one chunk size and window geometry (the
    # arrays are stacked); the first shard's auto-pick decides
    pets, lc, cwp = [], None, None
    for i in range(n_shards):
        pet = ps.build_pet(sp[i * n_local : (i + 1) * n_local, :],
                           data_dtype=data_dtype, lc=lc, cwp=cwp)
        lc, cwp = pet["lc"], pet["cwp"]
        pets.append(pet)
    pets_t, lc_t, cwp_t = [], None, None
    for i in range(n_shards):
        pet = ps.build_pet(
            sp[:, i * n_local : (i + 1) * n_local].T.conj().tocsr(),
            data_dtype=data_dtype, lc=lc_t, cwp=cwp_t,
        )
        lc_t, cwp_t = pet["lc"], pet["cwp"]
        pets_t.append(pet)
    out = PETPartition(n_local=n_local, shape=(n, m), perm=perm_np)
    for tag, plist in (("", pets), ("t_", pets_t)):
        nchunks = max(p["nchunks"] for p in plist)
        plist = [_pad_chunks(p, nchunks) for p in plist]
        for k in _ARR:
            out[tag + k] = jnp.stack([p[k] for p in plist])
        # hashable static geometry (pytree aux of the sharded operator)
        out[tag + "geom"] = (
            nchunks, plist[0]["ngroups"], plist[0]["pages_pad"],
            plist[0]["lc"], plist[0].get("cwp", 32),
        )
    out["fill"] = float(
        sum(p["nnz"] for p in pets)
        / max(1, sum(p["nchunks"] * p["lc"] * 128 for p in pets))
    )
    return out


@register_pytree_node_class
class ShardedPETOperator:
    """Local row-slab PET (inside shard_map); x all-gathered over ICI."""

    def __init__(self, arrays, geom, geom_t, n_local, n_global,
                 axis=ROWS, interpret=None):
        # arrays: dict with ent/dat/meta/meta_v and t_-prefixed adjoint set,
        # each already LOCAL (leading shard axis stripped by shard_map)
        self._a = arrays
        self._geom = geom
        self._geom_t = geom_t
        self.n_local = int(n_local)
        self.n_global = int(n_global)
        self.axis = axis
        self._interpret = interpret

    @property
    def dtype(self):
        return self._a["dat"].dtype

    @property
    def shape(self):
        return (self.n_local, self.n_local)  # local SPMD view

    def _apply(self, prefix, geom, x_full, n_out):
        # geom tuples from pre-cwp partitions have 4 entries (cwp=32)
        nchunks, ngroups, pages_pad, lc = geom[:4]
        cwp = geom[4] if len(geom) > 4 else 32
        pet = {
            "ent": self._a[prefix + "ent"],
            "dat": self._a[prefix + "dat"],
            "meta": self._a[prefix + "meta"],
            "meta_v": self._a[prefix + "meta_v"],
            "shape": (n_out, x_full.shape[0]),
            "pages_pad": pages_pad,
            "nchunks": nchunks,
            "ngroups": ngroups,
            "lc": lc,
            "cwp": cwp,
        }
        interpret = (
            jax.default_backend() != "tpu"
            if self._interpret is None
            else self._interpret
        )
        if x_full.ndim == 1:
            return ps.pet_matvec(pet, x_full, interpret=interpret)
        # blocked multi-RHS: the SpMM kernel streams each chunk's
        # index/metadata once for the whole column block
        return ps.pet_matmat(pet, x_full, interpret=interpret)

    def _cols(self, prefix, geom, x, n_out):
        x_full = lax.all_gather(x, self.axis, tiled=True)
        return self._apply(prefix, geom, x_full, n_out)

    def __matmul__(self, x):
        return self._cols("", self._geom, x, self.n_local)

    matvec = __matmul__

    def rmatvec(self, x):
        # adjoint row slab == column slab of A: the local PET of
        # A[:, slab]^H maps the full x to exactly the owned rows
        return self._cols("t_", self._geom_t, x, self.n_local)

    def tree_flatten(self):
        keys = tuple(self._a.keys())
        children = tuple(self._a[k] for k in keys)
        aux = (keys, self._geom, self._geom_t, self.n_local, self.n_global,
               self.axis, self._interpret)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, geom, geom_t, n_local, n_global, axis, interpret = aux
        return cls(dict(zip(keys, children)), geom, geom_t, n_local,
                   n_global, axis=axis, interpret=interpret)
