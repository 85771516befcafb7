"""Poisson surface reconstruction: TPU FFT indicator + native isosurface.

Replaces Open3D ``create_from_point_cloud_poisson(depth=9)`` + 5%-density
vertex pruning (``/root/reference/depth_to_pointcloud.py:245-281``) with a
TPU-first pipeline (Fourier formulation of Poisson reconstruction,
Kazhdan 2005 — the spectral solution of the same PDE the octree solver
discretizes):

1. splat oriented normals into a regular vector field V (trilinear
   scatter-add, one jitted program);
2. solve the Poisson equation  laplacian(chi) = div(V): central-difference
   divergence in real space, then spectrally
   ``chi_hat = div_hat / -|k|^2`` with Gaussian regularization — one
   forward FFT on TPU (512^3 fits HBM this way);
3. iso level = mean indicator value at the input samples (trilinear
   gather, as in the paper);
4. extract the isosurface with the native marching-tetrahedra kernel
   (``recon/native``) and prune vertices whose local sample density falls
   below a percentile (the reference's ``densities < percentile(5)`` step).

``grid_depth`` plays the role of Open3D's octree depth: grid size 2^depth.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnums=(2,))
def _splat(points01: Array, normals: Array, grid: int):
    """Trilinear scatter of normals (and unit weights) onto a grid^3 field.

    points01: (N, 3) in [0, 1]. Returns (V (3, G, G, G), W (G, G, G))."""
    pos = points01 * (grid - 1)
    # Clip BEFORE computing the fraction so boundary points splat into the
    # last cell with frac=1 (consistent with _trilinear_gather).
    base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, grid - 2)
    frac = pos - base

    field = jnp.zeros((3, grid, grid, grid), jnp.float32)
    weight = jnp.zeros((grid, grid, grid), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                     * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                     * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
                ix = base[:, 0] + dx
                iy = base[:, 1] + dy
                iz = base[:, 2] + dz
                weight = weight.at[ix, iy, iz].add(w)
                field = field.at[:, ix, iy, iz].add(
                    (normals * w[:, None]).T)
    return field, weight


@functools.partial(jax.jit, static_argnums=(1,))
def _divergence(field: Array, grid: int) -> Array:
    """Central-difference divergence of the splatted field, per-sample
    spacing, periodic wrap (consistent with the spectral solve; the cloud
    is padded away from the boundary). Real-space div means the solve
    needs ONE forward FFT instead of three — at the reference's depth 9
    (512^3, depth_to_pointcloud.py:269-272) this is what fits HBM
    (three-spectra variant peaked at 18.5 GB on a 16 GB chip)."""
    div = jnp.zeros((grid, grid, grid), jnp.float32)
    for ax in range(3):
        f = field[ax]
        div = div + (jnp.roll(f, -1, axis=ax)
                     - jnp.roll(f, 1, axis=ax)) * 0.5
    return div


@functools.partial(jax.jit, static_argnums=(1,))
def _solve_poisson_from_div(div: Array, grid: int,
                            smooth_sigma: float = 1.5) -> Array:
    """chi from div(V) via the spectral inverse Laplacian."""
    kx = jnp.fft.fftfreq(grid)[:, None, None] * 2 * jnp.pi
    ky = jnp.fft.fftfreq(grid)[None, :, None] * 2 * jnp.pi
    kz = jnp.fft.rfftfreq(grid)[None, None, :] * 2 * jnp.pi
    k2 = kx * kx + ky * ky + kz * kz
    div_hat = jnp.fft.rfftn(div)
    gauss = jnp.exp(-0.5 * (smooth_sigma ** 2) * k2)
    chi_hat = jnp.where(
        k2 > 0, (div_hat * gauss) / -jnp.maximum(k2, 1e-12), 0.0)
    return jnp.fft.irfftn(chi_hat, s=(grid, grid, grid))




@functools.partial(jax.jit, static_argnums=(1, 3))
def _active_cell_bits(chi: Array, grid: int, iso: Array,
                      round_f16: bool = False) -> Array:
    """Per-cell iso-straddle mask, bit-packed along z.

    A cell is active iff min(corners) < iso <= max(corners) — exactly the
    dense mesher's any_lo/any_hi skip test. ``round_f16`` applies f16
    rounding to ``chi`` first so the mask agrees with the f16 corner
    values the mesher interpolates (a cell that only straddles iso after
    rounding must not be skipped, or its visited neighbor emits boundary
    triangles with no complement — a crack). Returns
    (grid-1, grid-1, ceil((grid-1)/8)) uint8, unpackable with
    ``np.unpackbits`` (big-endian bit order).
    """
    if round_f16:
        chi = chi.astype(jnp.float16).astype(jnp.float32)
    cmin = jnp.minimum(chi[:-1], chi[1:])
    cmax = jnp.maximum(chi[:-1], chi[1:])
    cmin = jnp.minimum(cmin[:, :-1], cmin[:, 1:])
    cmax = jnp.maximum(cmax[:, :-1], cmax[:, 1:])
    cmin = jnp.minimum(cmin[..., :-1], cmin[..., 1:])
    cmax = jnp.maximum(cmax[..., :-1], cmax[..., 1:])
    active = (cmin < iso) & (cmax >= iso)
    g1 = grid - 1
    zpad = (-g1) % 8
    active = jnp.pad(active, ((0, 0), (0, 0), (0, zpad)))
    bits = active.reshape(g1, g1, -1, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gather_cell_corners(chi: Array, cell_ids: Array, grid: int,
                         out_f16: bool) -> Array:
    """(K,) flat corner-grid cell ids -> (K, 8) corner values (the dense
    mesher's cube-corner order)."""
    flat = chi.reshape(-1)
    # kCorner order (meshing.cpp): offsets of (dx, dy, dz) at stride
    # (grid^2, grid, 1).
    corners = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
               (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))
    offs = jnp.asarray([(dx * grid + dy) * grid + dz
                        for dx, dy, dz in corners], jnp.int32)
    vals = flat[cell_ids[:, None] + offs[None, :]]
    return vals.astype(jnp.float16) if out_f16 else vals


def _bucket(n: int, floor: int = 1 << 18) -> int:
    """Round up to a power of two (>= floor): keeps the data-dependent
    gather/readback shapes in a small static set so XLA compiles each
    program ONCE per bucket instead of once per reconstruction (compiles
    through the axon tunnel cost tens of seconds; see perf/poisson9*)."""
    b = floor
    while b < n:
        b <<= 1
    return b


def _pad_rows(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    if len(x) == n:
        return x
    pad = np.full((n - len(x),) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad])


@functools.partial(jax.jit, static_argnums=(2,))
def _trilinear_gather(volume: Array, points01: Array, grid: int) -> Array:
    pos = points01 * (grid - 1)
    base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, grid - 2)
    frac = pos - base
    out = jnp.zeros((points01.shape[0],), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                     * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                     * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
                out = out + w * volume[base[:, 0] + dx, base[:, 1] + dy,
                                       base[:, 2] + dz]
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def _masked_mean_gather(volume: Array, points01: Array, grid: int,
                        n_valid: Array) -> Array:
    """Mean gathered value over the first ``n_valid`` (bucket-padded)
    points."""
    vals = _trilinear_gather(volume, points01, grid)
    w = (jnp.arange(points01.shape[0]) < n_valid).astype(jnp.float32)
    return jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1.0)


def poisson_mesh(points: np.ndarray, normals: np.ndarray,
                 grid_depth: int = 7, smooth_sigma: float = 1.5,
                 density_percentile: float = 5.0, padding: float = 0.05):
    """Oriented point cloud -> (verts (V, 3), tris (T, 3)).

    grid_depth: grid = 2^depth per axis (Open3D octree-depth analog).
    The reference's depth 9 (512^3) runs in ~0.34 s device-side on a v5e
    (~2.7 GB HBM, perf/poisson9.jsonl); on CPU prefer 7-8.
    density_percentile: prune vertices whose splat density is below this
    percentile (reference removes 5%).
    """
    import time

    from .native import marching_tetrahedra

    timing = os.environ.get("E3D_POISSON_TIMING", "0") == "1"
    marks: list[tuple[str, float]] = []

    def mark(name: str) -> None:
        if timing:
            marks.append((name, time.time()))

    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    grid = 1 << grid_depth

    lo = points.min(axis=0)
    hi = points.max(axis=0)
    extent = float((hi - lo).max()) or 1.0
    lo = lo - padding * extent
    extent = extent * (1 + 2 * padding)
    points01 = (points - lo) / extent

    mark("start")
    # Bucket-pad the cloud so every device program has a static shape from
    # a small set (one compile per bucket, not per cloud). Padding points
    # sit at the (0,0,0) grid corner with ZERO normals: they contribute
    # nothing to the vector field (hence chi), only a little splat weight
    # at a corner `padding * extent` away from any real surface, and the
    # iso mean masks them out.
    n_pts = len(points01)
    nb = _bucket(n_pts)
    pts_pad = jnp.asarray(_pad_rows(points01.astype(np.float32), nb))
    nrm_pad = jnp.asarray(_pad_rows(normals, nb))
    field, weight = _splat(pts_pad, nrm_pad, grid)
    div = _divergence(field, grid)
    del field  # free 3x grid^3 HBM before the FFT allocates its spectra
    chi = _solve_poisson_from_div(div, grid, smooth_sigma)
    del div
    iso = float(_masked_mean_gather(chi, pts_pad, grid, n_pts))
    mark("device solve+iso")

    f16 = os.environ.get("E3D_POISSON_READBACK", "f16") == "f16"
    sparse_env = os.environ.get("E3D_POISSON_SPARSE", "auto")
    use_sparse = sparse_env == "1" or (sparse_env == "auto" and grid >= 256)
    spacing = extent / (grid - 1)
    if use_sparse:
        # Sparse path: the indicator is ~99% iso-inactive at depth 9, so
        # (1) a bit-packed per-cell straddle mask ((grid-1)^3 / 8 bytes,
        # 16.6 MB at 512^3) and (2) the straddling cells' corner values
        # (~1% of the volume) are all that crosses the tunnel — >5x less
        # than the full 268 MB f16 volume — and the native mesher visits
        # only those cells instead of all 134M.
        from .native import marching_tetrahedra_cells

        packed = np.asarray(_active_cell_bits(chi, grid, jnp.float32(iso),
                                              round_f16=f16))
        mark("active-mask readback")
        act = np.unpackbits(packed, axis=-1)[:, :, :grid - 1]
        ix, iy, iz = np.nonzero(act)
        if grid ** 3 > np.iinfo(np.int32).max:
            # int32 flat cell ids (and the mesher's 64-bit packed edge
            # keys) top out at grid 1290 / depth 10; wrap-around would
            # produce a silently garbage mesh.
            raise ValueError(
                f"grid {grid} overflows the sparse mesher's int32 cell "
                "ids; use grid_depth <= 10")
        cell_ids = ((ix.astype(np.int64) * grid + iy) * grid
                    + iz).astype(np.int32)
        mark("host cell decode")
        if len(cell_ids) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
        kb = _bucket(len(cell_ids))
        vals = np.asarray(
            _gather_cell_corners(chi, jnp.asarray(_pad_rows(cell_ids, kb)),
                                 grid, f16),
            np.float32)[:len(cell_ids)]
        mark("corner-value readback")
        verts, tris = marching_tetrahedra_cells(
            cell_ids, vals, (grid, grid, grid), iso, lo, spacing)
        mark("sparse marching tetrahedra")
    else:
        # Dense path (small grids / CPU): read the whole indicator back.
        # f16 halves the transfer (536 -> 268 MB at 512^3); iso-crossing
        # positions shift by O(f16 eps / cell gradient) — the
        # exact-cylinder fixture's radius std is unchanged
        # (tests/test_recon_geometric.py).
        if f16:
            chi_np = np.asarray(np.asarray(chi.astype(jnp.float16)),
                                np.float32)
        else:
            chi_np = np.asarray(chi)
        mark("indicator readback")
        verts, tris = marching_tetrahedra(chi_np, iso, lo, spacing)
        mark("marching tetrahedra")
    if len(verts) == 0:
        return verts, tris

    if density_percentile > 0:
        verts01 = ((verts - lo) / extent).astype(np.float32)
        vb = _bucket(len(verts01))
        dens = np.asarray(_trilinear_gather(
            weight, jnp.asarray(_pad_rows(verts01, vb)),
            grid))[:len(verts01)]
        keep = dens >= np.percentile(dens, density_percentile)
        remap = -np.ones(len(verts), np.int64)
        remap[keep] = np.arange(int(keep.sum()))
        tri_keep = keep[tris].all(axis=1)
        tris = remap[tris[tri_keep]].astype(np.int32)
        verts = verts[keep]
    mark("density prune")
    if timing:
        import sys

        t0 = marks[0][1]
        prev = t0
        for name, t in marks[1:]:
            print(f"[poisson timing] {name}: {t - prev:.2f}s "
                  f"(cum {t - t0:.2f}s)", file=sys.stderr, flush=True)
            prev = t
    return verts, tris
