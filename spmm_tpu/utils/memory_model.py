"""Analytic peak-HBM model for the SpGEMM strategies.

The reference reports measured ΔPeak-VRAM per algorithm
(SpGEMM_alg_comparison/profiler.py:82-133); on TPU backends without
`device.memory_stats()` (e.g. remote relays) this model provides the same
trade-off picture analytically, and `utils.profiler.profile_op` reports the
measured delta where stats exist.  Byte counts assume fp32 data / int32
indices.
"""

from __future__ import annotations

from typing import Dict


def alg1_peak_bytes(m: int, k: int, n: int, nnz_a: int, nnz_b: int,
                    nnz_c: int) -> int:
    """Dense-intermediate engine, r5d packed-stream kernels: peak is the
    max over its phases (B densify with A resident / value+pattern
    matmuls / the extraction program).  Kernel streams are 8 B/entry
    (packed meta int32 + f32 values, bf16 split in-kernel)."""
    inputs = 8 * (nnz_a + nnz_b) + 8 * (m + k + 2)
    phase_b = inputs + 6 * m * k + 8 * nnz_b + 6 * k * n
    phase_mm = (inputs + 6 * (m * k + k * n)
                + 4 * m * n + 4 * m * n + m * n)  # C + counts + mask
    extract = 4 * m * n + m * n + 28 * nnz_c
    return max(phase_b, phase_mm, extract)


def alg2_esc_peak_bytes(m: int, k: int, n: int, nnz_a: int, nnz_b: int,
                        products: int, nnz_c: int) -> int:
    """ESC: expanded triplets (row, col, val) + sort copies + scan."""
    triplets = 12 * products             # row+col+val
    sort_ws = 12 * products              # lax.sort double-buffers
    scan = 8 * products                  # segsum tree + flags
    out = 8 * nnz_c + 4 * (m + 1)
    inputs = 8 * (nnz_a + nnz_b)
    return triplets + sort_ws + scan + out + inputs


def alg3_esc_peak_bytes(m: int, k: int, n: int, nnz_a: int, nnz_b: int,
                        products: int, nnz_c: int,
                        chunk_fraction: float = 0.2) -> int:
    """Chunked ESC: one chunk workspace live at a time + accumulated out."""
    w = max(1, int(products * min(max(chunk_fraction, 1e-3), 1.0)))
    chunk_ws = (12 + 12 + 8) * w
    out = 8 * nnz_c + 4 * (m + 1)
    inputs = 8 * (nnz_a + nnz_b)
    return chunk_ws + out + inputs


_TILE = 128


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def alg2_blocked_peak_bytes(m: int, k: int, n: int, nnz_a: int,
                            nnz_b: int, nnz_c: int) -> int:
    """Blocked alg2 (r5d pattern-only symbolic phase + packed-stream
    kernels): peak = max of the two programs.  Count: bf16 A/B patterns
    (no value machinery since r5b) + packed meta streams + the boolean
    mask output.  Compute: inputs + mask + value-only dense B + b meta/
    value streams + single-copy cols/vals outputs (in-place update
    chains — r5 job 013's one-consumer rule) + the per-tile extraction
    workspace.  ×1.2 safety residual (the gate prefers overestimates);
    band −12%/+34% on the r5d v5e grid."""
    n_pad = _pad128(n)
    m_pad = _pad128(m)
    T = max(m_pad // _TILE, 1)
    cap_t = nnz_c // T
    inputs = 8 * (nnz_a + nnz_b) + 4 * (m + k + 2)
    mask = m_pad * n_pad
    count = (inputs + mask + 2 * (m_pad * k + k * n_pad)
             + 4 * (nnz_a + nnz_b) + 4 * _TILE * n_pad)
    compute = (inputs + mask
               + 4 * k * n_pad + 8 * nnz_b   # bd + its kernel streams
               + 8 * nnz_c + 4 * (m + 1)     # cols+vals, single copies
               + 40 * _TILE * n_pad + 8 * cap_t)  # extraction workspace
    return int(1.2 * max(count, compute))


def alg3_blocked_peak_bytes(m: int, k: int, n: int, nnz_a: int,
                            nnz_b: int, nnz_c: int,
                            chunk_fraction: float = 0.2) -> int:
    """Blocked alg3, r5 `group` engine (the dispatch default wherever
    the host structural product is affordable): B panel-major streams
    (b args carry lcol + rank, and the in-program value-permute sort
    holds in+out copies), one (k, n_b) panel (padded + sliced), a
    G-row-tile staging stripe (values f32 + bool mask, G from
    _GROUP_STAGING_BYTES), host-exact structure so only VALUES are
    program outputs (single copy, in-place chain), plus the per-tile
    extraction workspace.  Recalibrated r5d
    ×1.15 safety residual; band −14%/+33% on the r5d v5e grid (the
    scan3/scan2 fallbacks for larger grids run close enough for
    plan-ahead purposes)."""
    n_pad = _pad128(n)
    cf = min(max(float(chunk_fraction), 1e-3), 1.0)
    n_b = min(max(_pad128(int(-(-cf * n // 1))), 128), n_pad)
    a_args = 8 * nnz_a + 4 * (m + 1)
    b_args = 16 * nnz_b + 4 * (k + 1)       # lcol+data+rank+panel ptrs
    sort_tmp = 16 * nnz_b                   # rank sort in+out
    stage_rows = max(1, min(-(-m // _TILE),
                            (8 << 20) // (_TILE * n_pad * 5)))
    stage = stage_rows * _TILE * n_pad * 5  # f32 values + bool mask
    panel_b = 6 * k * n_b                   # no padded+sliced pair (r5b)
    a_tile = 6 * _TILE * k
    out = 4 * nnz_c                         # values only (cols on host)
    extract_ws = 40 * _TILE * n_pad
    return int(1.15 * (a_args + b_args + sort_tmp + stage + panel_b
                       + a_tile + out + extract_ws))


def spgemm_sharded_peak_bytes(m: int, k: int, n: int, nnz_a: int,
                              nnz_b: int, D: int,
                              stream_b: bool = True) -> int:
    """Per-device peak for the distributed sparse-in/sparse-out SpGEMM
    (`parallel.sharded.spgemm_sharded_sparse`).

    stream_b=True (ppermute ring): dense A panel (m/D, k) f32+bf16, ONE
    dense B block (k/D, n) f32+bf16 live at a time (plus one in flight),
    C panel + counts (m/D, n) — every dense term is O(1/D).
    stream_b=False (replicated): the full (k, n) B is densified on every
    device — the O(k·n) term that defeats scaling.
    """
    r_local = -(-m // D)
    rb = -(-k // D)
    a_panel = 6 * r_local * (k + rb)       # f32 values + bf16 pattern
    c_panel = 8 * r_local * n              # product f32 + counts f32
    inputs = 8 * (-(-nnz_a // D) + -(-nnz_b // D))
    if stream_b:
        b_term = 2 * 6 * rb * n            # current + in-flight block
    else:
        b_term = 6 * k * n                 # full densified B
    return a_panel + b_term + c_panel + inputs


def spmv_sharded_peak_bytes(m: int, n: int, nnz: int, D: int,
                            stream_x: bool = True) -> int:
    """Per-device peak for distributed SpMV (`parallel.sharded`).

    stream_x=True (`spmv_sharded_streamed`): x lives as ONE (n/D) block
    per device (plus one in flight on the ring) — O(n/D); the entry
    tables are the per-shard nnz padded per (device, block).
    stream_x=False (`spmv_sharded`): the full x is replicated on every
    device — the O(n) term VERDICT r3 missing-2 flags.
    """
    nb = -(-n // D)
    r_local = -(-m // D)
    entries = 12 * (-(-nnz // D))        # rows+cols int32 + f32 data
    ybuf = 4 * (D * r_local + r_local)   # per-block partials + fold acc
    x_term = 2 * 4 * nb if stream_x else 4 * n
    return entries + ybuf + x_term


def spgemm_peak_estimate(a, b, alg: int = 1,
                         chunk_fraction: float = 0.2) -> Dict[str, float]:
    """Peak-HBM estimate for `spgemm(a, b, alg)` without running it.

    Mirrors the op's engine dispatch (ops/spgemm.spgemm): alg 2/3 model
    the BLOCKED dense-intermediate engines when `_blocked_feasible`
    holds (the regime the flagship grid measures) and the ESC engines
    otherwise.  Where exactness matters, prefer the measured
    `utils.memtrace.op_memory_analysis` (XLA buffer assignment) — this
    model is the plan-ahead estimate, recalibrated r5d against the full
    v5e grid (19 cells, benchmarks/grid_latest.json is the measured
    truth): alg2 −13%/+35%, alg3 −14%/+34%, alg1 −20%/+51% (alg1's
    d=0.1 cells overestimate: the model charges value+pattern matmul
    outputs as fully co-live, which XLA's scheduler avoids there).
    Overestimates are the safe direction for the feasibility gates."""
    from spmm_tpu.ops.spgemm import _blocked_feasible, spgemm_nnz_estimate

    m, k = a.shape
    n = b.shape[1]
    products, ub = spgemm_nnz_estimate(a, b)
    nnz_c = min(ub, m * n)  # upper bound
    blocked = _blocked_feasible(a, b)
    if alg in (0, 1):
        peak = alg1_peak_bytes(m, k, n, a.nnz, b.nnz, nnz_c)
    elif alg == 2:
        peak = (alg2_blocked_peak_bytes(m, k, n, a.nnz, b.nnz, nnz_c)
                if blocked else
                alg2_esc_peak_bytes(m, k, n, a.nnz, b.nnz, products,
                                    nnz_c))
    else:
        peak = (alg3_blocked_peak_bytes(m, k, n, a.nnz, b.nnz, nnz_c,
                                        chunk_fraction)
                if blocked else
                alg3_esc_peak_bytes(m, k, n, a.nnz, b.nnz, products,
                                    nnz_c, chunk_fraction))
    return {"alg": alg, "products": products, "nnz_c_upper": nnz_c,
            "peak_bytes": peak, "peak_mb": peak / 2**20}
