"""Pallas TPU kernel: tiled-band cross-correlation for the many-target
regime (small template over a huge score map — the reference's BlockMax
tests, README.md:23-29; MatchTemplate hot loop MatchToolDlg.cpp:1275-1311).

Why: XLA lowers a single-input-channel conv catastrophically (~5 GMAC/s
measured), and the round-3 full-width banded-Toeplitz form issues
W/w ~ 70x the algorithmic MACs AND re-reads the canvas from HBM once per
template row (ROOFLINE_r03: effective_frac <= 1.1%). This kernel fixes
both at once:

  * Column tiling: the output is computed in TX=128-lane stripes. A
    stripe needs canvas lanes [i*TX, i*TX + TX + w - 1) — delivered as
    TWO adjacent 128-lane column blocks of the padded canvas (Pallas
    BlockSpec pipelining; no im2col materialization in HBM). The band
    contraction is then TX + pad(w-1) deep instead of W deep: issued-MAC
    expansion drops from W/w (~70x) to (TX + pad(w-1))/w (~5.9x for
    w = 27).
  * VMEM residency: each canvas block is fetched O(1) times and all h
    template rows contract against it from VMEM, instead of h HBM
    passes.

Row-shift alignment (the part that shapes the kernel): Mosaic only
allows dynamic/cheap memory access at sublane-tile granularity, but the
band contraction needs row shifts slab[y+dy] for every dy in [0, h).
Writing dy = 8q + r, the kernel materializes the 8 sublane ROTATIONS
r = 0..7 of the slab into VMEM scratch (static shuffle copies), after
which every (q, ty) access is tile-aligned and free. The h dots per
output tile then merge into 8 deep-K dots (one per residue r,
contraction nq_r * TX deep) — MXU-shaped work instead of h
latency-bound K=128 dots interleaved with h unaligned shuffles.

v2 (round 5): the staging is ping-ponged. With the column stripe `i`
innermost in the grid, step i's B block (column i+1) is step i+1's A
block, so its staged rotations are kept in one of two alternating
scratch buffers and reused — per step only ONE block's rotations are
staged (v1 staged both), halving the staging copies that dominated the
kernel's fixed cost (ROOFLINE_r04 target_notes).

out[y, v] (stripe i) = sum_dy slab[y + dy, :] @ Band[dy],
Band[dy][k, v] = T[dy, k - v] (0 <= k - v < w), split at the TX lane
boundary into an A part (K = TX) against column block i and a B part
(K = pad(w-1, 32)) against block i+1.

Precision follows the repo's centered-u8 scheme (ops/ncc.py module doc):
int8 with int32 accumulation is exact under the h*w*128^2 < 2^31 bound.
bf16 inputs (centered u8 values are exactly representable) with f32
accumulation are worst-case exact under the analogous h*w*128^2 < 2^24
bound (f32 integer accumulation); past it (h*w > 1024, reachable within
this kernel's h <= 64, w <= 129 envelope) exactness holds for
real-imagery value distributions — partial sums of centered (zero-mean-
ish) pixels stay far below the adversarial all-extreme bound — and is
what the conformance tests pin, but an adversarial constant-extreme
canvas can round by ULPs. The int8 path is preferred wherever its
(stricter-input, wider-accumulator) bound holds.

Tuning knobs (static args; defaults are the round-5 v2 on-chip sweep
winners, AUTOTUNE_r05.json — Test7 shape int8: B1 0.51 ms, B16 2.8 ms):
tile_rows = accumulator tile rows (default 128), row_tiles = tiles per
grid step, merge_ab = one dot per residue (A and B operands
lane-concatenated) instead of two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX = 128    # output stripe lanes (MXU columns)
TY = 256    # default accumulator tile rows (MXU rows)
NYG = 8     # default row tiles per grid step (bounds rot-scratch VMEM)
MERGE_AB = True  # one dot per residue (A+B lane-concatenated)

# Eligibility bounds (callers gate on these; asserted here).
MAX_W = TX + 1   # two column blocks cover TX + w - 1 <= 2*TX lanes
MAX_H = 64       # grouped bands must stay small in VMEM


def eligible(h: int, w: int) -> bool:
    return 2 <= w <= MAX_W and 1 <= h <= MAX_H


def _w1p(w: int) -> int:
    """B-part contraction depth: w-1 padded to the int8 sublane tile."""
    return (w - 1 + 31) // 32 * 32


def _build_bands(templ_c: jnp.ndarray, dtype):
    """Residue-grouped banded-Toeplitz matrices.

    bandsA [8, nq*TX, TX]:  bandsA[r][q*TX + k, v]   = T[8q+r, k - v]
    bandsB [8, nq*W1P, TX]: bandsB[r][q*W1P + j, v]  = T[8q+r, TX + j - v]
    (zero outside 0 <= k - v < w; rows for 8q + r >= h are zero, and the
    kernel statically skips them via nq_r). Built by diagonal
    accumulation like ops/ncc.ccorr_banded (exact)."""
    h, w = templ_c.shape
    nq = -(-h // 8)
    w1p = _w1p(w)
    tc = templ_c.astype(dtype)

    k_a = jax.lax.broadcasted_iota(jnp.int32, (TX, TX), 0)
    v_a = jax.lax.broadcasted_iota(jnp.int32, (TX, TX), 1)
    k_b = jax.lax.broadcasted_iota(jnp.int32, (w1p, TX), 0) + TX
    v_b = jax.lax.broadcasted_iota(jnp.int32, (w1p, TX), 1)

    da = k_a - v_a
    db = k_b - v_b

    def one_dy(dy):
        if dy >= h:
            return (jnp.zeros((TX, TX), dtype), jnp.zeros((w1p, TX), dtype))
        a = jnp.zeros((TX, TX), dtype)
        b = jnp.zeros((w1p, TX), dtype)
        for j in range(w):
            if dtype == jnp.int8:
                a = a + jnp.where(da == j, tc[dy, j], jnp.int8(0))
                b = b + jnp.where(db == j, tc[dy, j], jnp.int8(0))
            else:
                a = a + tc[dy, j] * (da == j).astype(dtype)
                b = b + tc[dy, j] * (db == j).astype(dtype)
        return a, b

    rowsA, rowsB = [], []
    for r in range(8):
        pa = [one_dy(8 * q + r) for q in range(nq)]
        rowsA.append(jnp.concatenate([p[0] for p in pa], axis=0))
        rowsB.append(jnp.concatenate([p[1] for p in pa], axis=0))
    return jnp.stack(rowsA), jnp.stack(rowsB)


def _corr_body(h, w, nyg, ty_rows, merge_ab, slabA0, slabA1, slabB0, slabB1,
               bandsA, bandsB, out_ref, rot0, rot1):
    accdt = jnp.int32 if bandsA.dtype == jnp.int8 else jnp.float32
    w1 = w - 1
    w1p = _w1p(w)
    R = rot0.shape[1]
    dn = (((1,), (0,)), ((), ()))
    # Rotations with no template rows (8q + r >= h for all q) are never
    # read — skip their staging (matters for h < 8).
    rs = range(min(8, h))

    # Stage the sublane rotations of the slab (rows G..2G of the next
    # row-group provide the h-1 overlap): static shuffle copies, after
    # which every row access below is tile-aligned.
    # (pltpu.roll was tried for the staging and rejected by this Mosaic
    # version at these shapes; static unaligned slices compile — they
    # were ~2/3 of the kernel's fixed time in v1, see ROOFLINE_r04.)
    #
    # v2 ping-pong (round 5): with `i` the innermost grid dim, this
    # step's B column block (col i+1) is the NEXT step's A block, so its
    # rotations are staged once and REUSED: col j's rotations live in
    # scratch buffer j % 2. Per step only the B block is staged (plus
    # the A block at each stripe-row start i == 0) — half of v1's
    # staging volume.
    i = pl.program_id(2)
    par = i % 2

    @pl.when(i == 0)
    def _():
        valA = jnp.concatenate([slabA0[0], slabA1[0]], axis=0)
        for r in rs:
            rot0[r] = jax.lax.slice_in_dim(valA, r, r + R, axis=0)

    def stage_b(buf):
        valB = jnp.concatenate([slabB0[0], slabB1[0]], axis=0)
        for r in rs:
            buf[r] = jax.lax.slice_in_dim(valB, r, r + R, axis=0)

    @pl.when(par == 0)
    def _():
        stage_b(rot1)

    @pl.when(par == 1)
    def _():
        stage_b(rot0)

    def compute(rotA, rotB):
        for ty in range(nyg):
            y0 = ty * ty_rows
            acc = jnp.zeros((ty_rows, TX), accdt)
            for r in range(8):
                nq_r = len(range(r, h, 8))
                if nq_r == 0:
                    continue
                piecesA = [rotA[r, y0 + 8 * q:y0 + 8 * q + ty_rows, :]
                           for q in range(nq_r)]
                piecesB = ([rotB[r, y0 + 8 * q:y0 + 8 * q + ty_rows, :w1p]
                            for q in range(nq_r)] if w1 else [])
                if merge_ab and piecesB:
                    a_cat = jnp.concatenate(piecesA + piecesB, axis=1)
                    b_cat = jnp.concatenate(
                        [bandsA[r, :nq_r * TX, :],
                         bandsB[r, :nq_r * w1p, :]], axis=0)
                    acc = acc + jax.lax.dot_general(
                        a_cat, b_cat, dn, preferred_element_type=accdt)
                else:
                    acc = acc + jax.lax.dot_general(
                        jnp.concatenate(piecesA, axis=1),
                        bandsA[r, :nq_r * TX, :], dn,
                        preferred_element_type=accdt)
                    if piecesB:
                        acc = acc + jax.lax.dot_general(
                            jnp.concatenate(piecesB, axis=1),
                            bandsB[r, :nq_r * w1p, :], dn,
                            preferred_element_type=accdt)
            out_ref[0, y0:y0 + ty_rows, :] = acc.astype(jnp.float32)

    @pl.when(par == 0)
    def _():
        compute(rot0, rot1)

    @pl.when(par == 1)
    def _():
        compute(rot1, rot0)


@functools.partial(jax.jit,
                   static_argnames=("compute_dtype", "interpret",
                                    "tile_rows", "row_tiles", "merge_ab"))
def ccorr_tiledband_pallas(
    canvases_c: jnp.ndarray,   # [B, H, W] f32, centered (S - 128)
    templ_c: jnp.ndarray,      # [h, w] f32, centered (T - 128)
    compute_dtype: str = "bf16",
    interpret: bool = False,
    tile_rows: int = None,
    row_tiles: int = NYG,
    merge_ab: bool = MERGE_AB,
) -> jnp.ndarray:
    """Raw centered cross-correlation -> [B, Ho, Wo] f32."""
    B, H, W = canvases_c.shape
    h, w = templ_c.shape
    if tile_rows is None:
        # Measured v2 default (round-5 on-chip sweep, AUTOTUNE_r05):
        # tile_rows=128 is best or within noise of best on every measured
        # (shape, B) cell — t7 B4 0.87 vs 2.85 at 256, t4 B1 0.29 vs
        # 0.55, h64 B1 3.9 vs 5.9; the one cell preferring 256 (t7 B1,
        # 0.51 vs 0.66) loses 0.15 ms. Smaller row-groups also keep the
        # rotation scratch within VMEM for bf16 (256-row groups at big
        # maps OOM the Mosaic compile in bf16 — observed HTTP-500s).
        tile_rows = 128
    # Loud validation (reachable from the public
    # ncc_score_map(method="tiledband"); the auto path pre-gates but the
    # explicit path must not silently mis-run — and asserts vanish
    # under python -O).
    if not eligible(h, w):
        raise ValueError(
            f"tiledband kernel serves 2 <= w <= {MAX_W} and h <= {MAX_H}; "
            f"got template {h}x{w} — use method='banded'/'conv' instead")
    if not (tile_rows % 256 == 0 or tile_rows in (64, 128)):
        raise ValueError(f"tile_rows must be 64, 128 or a multiple of 256, "
                         f"got {tile_rows}")
    Ho, Wo = H - h + 1, W - w + 1

    use_i8 = compute_dtype == "int8" and h * w * 128 * 128 < 2**31
    dt = (jnp.int8 if use_i8
          else jnp.bfloat16 if compute_dtype in ("bf16", "int8")
          else jnp.float32)

    nx = pl.cdiv(Wo, TX)
    ny = pl.cdiv(Ho, tile_rows)
    nyg = min(row_tiles, ny)
    nq = -(-h // 8)
    # The rotation staging slices [r, r + R) rows out of the 2G-row slab
    # (this step's block + the next); r <= 7 and R = G + 8*nq require
    # G >= 8*nq + 7. Small outputs (ny * tile_rows short of that) bump
    # nyg — the extra rows are zero padding, not extra real work.
    while nyg * tile_rows < 8 * nq + 7:
        nyg += 1
    # VMEM budget for the two rotation-scratch buffers (2 * 8 * R * TX *
    # itemsize): wide dtypes at big row-groups OOM the Mosaic compile
    # (bf16 G=2048 -> 8.5 MB scratch alone, observed compile failures);
    # shrink the row-group until the scratch fits ~4.5 MB.
    min_nyg = -(-(8 * nq + 7) // tile_rows)
    itemsize = jnp.dtype(dt).itemsize
    while nyg > min_nyg and \
            2 * 8 * (nyg * tile_rows + 8 * nq) * TX * itemsize > 4_500_000:
        nyg -= 1
    ng = pl.cdiv(ny, nyg)
    G = nyg * tile_rows             # output rows per grid step
    R = G + 8 * nq                  # rot-scratch rows (covers y0+8q+TY)
    # Row blocks: each step reads its own G rows plus the first R+8-G rows
    # of the NEXT block for the dy overlap -> pad to (ng + 1) blocks.
    Hp = (ng + 1) * G
    Wp = (nx + 1) * TX              # slabB of the last stripe reads blk nx
    canv = jnp.pad(canvases_c, ((0, 0), (0, Hp - H), (0, Wp - W)))
    canv = canv.astype(dt)
    bandsA, bandsB = _build_bands(templ_c, dt)

    body = functools.partial(_corr_body, h, w, nyg, tile_rows, merge_ab)
    out = pl.pallas_call(
        body,
        grid=(B, ng, nx),
        in_specs=[
            pl.BlockSpec((1, G, TX), lambda b, g, i: (b, g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, TX), lambda b, g, i: (b, g + 1, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, TX), lambda b, g, i: (b, g, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, TX), lambda b, g, i: (b, g + 1, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nq * TX, TX), lambda b, g, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nq * _w1p(w), TX), lambda b, g, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, TX), lambda b, g, i: (b, g, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ng * G, nx * TX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, R, TX), dt),
            pltpu.VMEM((8, R, TX), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nx * ng * G * h * (TX + _w1p(w)) * TX,
            bytes_accessed=4 * B * nx * ng * G * TX * canv.dtype.itemsize
            + B * ng * G * nx * TX * 4,
            transcendentals=0),
        interpret=interpret,
    )(canv, canv, canv, canv, bandsA, bandsB)
    return out[:, :Ho, :Wo]
