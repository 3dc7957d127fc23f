"""Row-wise banded (stencil) operators and grid-Laplacian generators.

The benchmark family of BASELINE.json (2D/3D Poisson at 1M-100M rows) is
banded: every row reads a fixed set of column offsets.  Row-wise banded
storage ``coeffs[d, i] = A[i, i + offsets[d]]`` makes the matvec a sum of
*shifted elementwise products* — no index traffic at all, pure VPU streaming
at HBM speed-of-light, and the natural format for halo-exchange row
partitioning (each shard only needs ``max|offset|`` remote entries per side).

This is the TPU-native answer to the reference's implicit reliance on scipy
CSR matvecs (SURVEY.md §2.2): keep CSR for general sparsity, use banded
storage where the structure allows.
"""

import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class BandedOperator:
    """Row-wise banded operator: ``y[i] = sum_d coeffs[d, i] * x[i + offsets[d]]``.

    ``coeffs`` has shape ``(ndiag, N)``; entries whose column index would fall
    outside [0, N) must be zero (enforced by the constructors here).
    """

    def __init__(self, coeffs, offsets, hermitian=False):
        self.coeffs = coeffs
        self.offsets = tuple(int(o) for o in offsets)
        self.hermitian = bool(hermitian)

    @property
    def shape(self):
        n = self.coeffs.shape[1]
        return (n, n)

    @property
    def dtype(self):
        return self.coeffs.dtype

    @property
    def nnz(self):
        n = self.coeffs.shape[1]
        return sum(n - abs(o) for o in self.offsets)

    def __matmul__(self, x):
        n = self.coeffs.shape[1]
        y = jnp.zeros(x.shape, jnp.result_type(self.coeffs, x))
        for d, off in enumerate(self.offsets):
            c = self.coeffs[d]
            if off >= 0:
                contrib = (
                    c[: n - off].reshape((n - off,) + (1,) * (x.ndim - 1))
                    * x[off:]
                )
                y = y.at[: n - off].add(contrib)
            else:
                contrib = (
                    c[-off:].reshape((n + off,) + (1,) * (x.ndim - 1))
                    * x[: n + off]
                )
                y = y.at[-off:].add(contrib)
        return y

    matvec = __matmul__

    def rmatvec(self, x):
        if self.hermitian:
            return self @ x
        n = self.coeffs.shape[1]
        y = jnp.zeros(x.shape, jnp.result_type(self.coeffs, x))
        for d, off in enumerate(self.offsets):
            c = jnp.conj(self.coeffs[d])
            if off >= 0:
                contrib = (
                    c[: n - off].reshape((n - off,) + (1,) * (x.ndim - 1))
                    * x[: n - off]
                )
                y = y.at[off:].add(contrib)
            else:
                contrib = (
                    c[-off:].reshape((n + off,) + (1,) * (x.ndim - 1)) * x[-off:]
                )
                y = y.at[: n + off].add(contrib)
        return y

    def diagonal(self):
        if 0 in self.offsets:
            return self.coeffs[self.offsets.index(0)]
        return jnp.zeros(self.coeffs.shape[1], self.dtype)

    def tocsr(self):
        from .sparse import CSROperator

        import scipy.sparse

        n = self.coeffs.shape[1]
        rows, cols, vals = [], [], []
        cf = np.asarray(self.coeffs)
        for d, off in enumerate(self.offsets):
            i = np.arange(max(0, -off), min(n, n - off))
            rows.append(i)
            cols.append(i + off)
            vals.append(cf[d, i])
        sp = scipy.sparse.csr_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n),
        )
        return CSROperator.from_scipy(sp)

    def todense(self):
        n = self.coeffs.shape[1]
        out = jnp.zeros((n, n), self.dtype)
        for d, off in enumerate(self.offsets):
            i = jnp.arange(max(0, -off), min(n, n - off))
            out = out.at[i, i + off].set(self.coeffs[d, i])
        return out

    def tree_flatten(self):
        return (self.coeffs,), (self.offsets, self.hermitian)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, hermitian = aux
        return cls(children[0], offsets, hermitian=hermitian)


@register_pytree_node_class
class GridStencilOperator(BandedOperator):
    """Banded operator whose bands decompose over a grid with last dim ``ny``.

    Same flat ``(N,)``-vector interface and semantics as
    :class:`BandedOperator`, plus a grid factorization ``offset = dr * ny +
    dc`` (``|dc| < ny/2``) that unlocks the TPU speed-of-light path: the
    matvec runs as a 2-D stencil — row shifts on the sublane dim, column
    shifts as lane rolls — via the Pallas kernel
    (:mod:`krylov_tpu.ops.pallas_stencil`) on TPU, or a padded-2-D XLA
    formulation elsewhere (both measured far ahead of the flattened 1-D
    shifted-slice form: ~12x and ~4.3x on v5e).

    Contract: coefficients must be zero wherever the 2-D neighbor
    ``(i + dr, j + dc)`` leaves the grid (the constructors here guarantee
    it); the kernel's wrapped/zero halo reads are then unobservable.

    Coefficients are stored in the 2-D ``(ndiag, M, ny)`` device layout
    (1-D<->2-D reshapes are relayout copies on TPU tiled memory — measured
    ~3x per-matvec penalty when done per iteration); the flat ``(ndiag, N)``
    view used by the inherited utility methods is exposed as a property.
    Vectors may be flat ``(N,)`` or grid-shaped ``(M, ny)``; grid-shaped
    vectors avoid the per-iteration vector relayout entirely and are the
    fast path for whole solves (inner products and axpys are shape-agnostic,
    so every solver works on them with a full-contraction ``inner``).
    """

    def __init__(self, coeffs, offsets, ny, hermitian=False):
        self.offsets = tuple(int(o) for o in offsets)
        self.hermitian = bool(hermitian)
        self.ny = int(ny)
        if coeffs.ndim == 2:
            n = coeffs.shape[1]
            if n % self.ny:
                raise ValueError(f"N={n} not a multiple of grid last-dim {ny}")
            coeffs = coeffs.reshape(coeffs.shape[0], n // self.ny, self.ny)
        self.coeffs2d = coeffs  # (ndiag, M, ny)
        self.row_offsets = tuple(
            int(round(o / self.ny)) for o in self.offsets
        )
        self.col_offsets = tuple(
            int(o - r * self.ny) for o, r in zip(self.offsets, self.row_offsets)
        )
        if any(abs(c) >= self.ny for c in self.col_offsets):
            raise ValueError(
                f"offsets {self.offsets} do not decompose over ny={ny}"
            )

    @property
    def coeffs(self):
        """Flat row-aligned view (ndiag, N) — utility paths only."""
        nd, M, ny = self.coeffs2d.shape
        return self.coeffs2d.reshape(nd, M * ny)

    @property
    def grid(self):
        """(M, ny) collapsed grid shape of this operator's vector space."""
        return self.coeffs2d.shape[1:]

    # solvers accept grid-shaped vectors for this operator (solvers/_common.py)
    vector_shape = grid

    def _matvec_2d(self, c2, x2):
        """Padded-shift XLA formulation on the (M, ny) grid view."""
        y = None
        for d, (dr, dc) in enumerate(zip(self.row_offsets, self.col_offsets)):
            seg = x2
            if dr > 0:
                seg = jnp.pad(seg[dr:], ((0, dr), (0, 0)))
            elif dr < 0:
                seg = jnp.pad(seg[:dr], ((-dr, 0), (0, 0)))
            if dc > 0:
                seg = jnp.pad(seg[:, dc:], ((0, 0), (0, dc)))
            elif dc < 0:
                seg = jnp.pad(seg[:, :dc], ((0, 0), (-dc, 0)))
            term = c2[d] * seg
            y = term if y is None else y + term
        return y

    def _apply_grid(self, x2):
        from . import pallas_stencil

        M, ny = self.grid
        if pallas_stencil.supports(x2.dtype, M, ny, self.row_offsets):
            return pallas_stencil.stencil2d_matvec(
                self.coeffs2d, x2, self.row_offsets, self.col_offsets
            )
        return self._matvec_2d(self.coeffs2d, x2)

    def __matmul__(self, x):
        M, ny = self.grid
        if x.ndim == 2 and x.shape == (M, ny):
            return self._apply_grid(x)  # grid-shaped vector: no relayout
        if x.ndim != 1:
            # multi-RHS (N, k): generic banded path for now
            return BandedOperator.__matmul__(self, x)
        return self._apply_grid(x.reshape(M, ny)).reshape(x.shape)

    matvec = __matmul__

    def rmatvec(self, x):
        if self.hermitian:
            return self @ x
        return BandedOperator.rmatvec(self, x)

    def tree_flatten(self):
        return (self.coeffs2d,), (self.offsets, self.ny, self.hermitian)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, ny, hermitian = aux
        return cls(children[0], offsets, ny, hermitian=hermitian)


def _laplacian_coeffs(shape_nd, dtype):
    """Row-wise banded coefficients of the (2*d)-point Laplacian on an
    n-D grid with natural (last-axis-fastest) ordering and Dirichlet BCs."""
    nd = len(shape_nd)
    N = int(np.prod(shape_nd))
    idx = np.arange(N)
    coords = np.stack(np.unravel_index(idx, shape_nd), axis=0)  # (nd, N)

    strides = [int(np.prod(shape_nd[k + 1 :])) for k in range(nd)]
    offsets = []
    coeff_rows = []

    # center
    offsets.append(0)
    coeff_rows.append(np.full(N, 2.0 * nd, dtype=dtype))

    for k in range(nd):
        s = strides[k]
        # +s neighbor exists when coord < n_k - 1
        mask_p = (coords[k] < shape_nd[k] - 1).astype(dtype)
        mask_m = (coords[k] > 0).astype(dtype)
        offsets.append(s)
        coeff_rows.append(-mask_p)
        offsets.append(-s)
        coeff_rows.append(-mask_m)

    order = np.argsort(offsets)
    offsets = [offsets[i] for i in order]
    coeffs = np.stack([coeff_rows[i] for i in order], axis=0)
    return coeffs, offsets


def poisson_1d(n, dtype=np.float64):
    """Tridiagonal 1-D Laplacian (Dirichlet)."""
    coeffs, offsets = _laplacian_coeffs((n,), np.dtype(dtype))
    return BandedOperator(jnp.asarray(coeffs), offsets, hermitian=True)


def poisson_2d(nx, ny=None, dtype=np.float64):
    """5-point 2-D Laplacian (Dirichlet) on an (nx, ny) grid."""
    ny = nx if ny is None else ny
    coeffs, offsets = _laplacian_coeffs((nx, ny), np.dtype(dtype))
    return GridStencilOperator(jnp.asarray(coeffs), offsets, ny, hermitian=True)


def poisson_3d(nx, ny=None, nz=None, dtype=np.float64):
    """7-point 3-D Laplacian (Dirichlet) on an (nx, ny, nz) grid.

    Grid-collapsed to 2-D ``(nx * ny, nz)``: offsets ±1 are lane shifts,
    ±nz and ±ny*nz are sublane (row) shifts.
    """
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    coeffs, offsets = _laplacian_coeffs((nx, ny, nz), np.dtype(dtype))
    return GridStencilOperator(jnp.asarray(coeffs), offsets, nz, hermitian=True)
