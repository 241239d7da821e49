"""Pallas TPU kernel: fused XL relative-position attention (v3: matmul BD).

The XLA path materializes the [B, H, T, K] score and probability tensors in
HBM twice per layer (forward) plus again in the backward — at the training
shape (B=64 per chunk, H=10, T=128, K=1152) that is ~1.1 GB of HBM traffic
per layer per direction, the dominant cost of the step.  This kernel keeps
the whole score row-block in VMEM (K=1152 keys x 128 queries x f32 = 590 KB
per head), so scores/probabilities never touch HBM.  The kernels run under
a raised 40 MB vmem cap (``_vmem_limit``, COMMU_VMEM_MB) — the all-heads-in-one-program
working set of the memory-fused backward exceeds Mosaic's 16 MB default.

Operand layout: every tensor carries the head dim on SUBLANES and the token
dim on LANES — q/do: [B, H, dh, T]; k/v: [B, H, dh, M] + [B, H, dh, T].
With dh=50 the lane-minor layout the v1 kernel used ([..., K, 50]) padded
50 -> 128 lanes, a 2.56x tax on HBM bytes, VMEM, and MXU lane utilization;
dh on sublanes pads only 50 -> 56.

K/V arrive SPLIT into their memory and window halves, straight from separate
projections of the XL memory and the current segment — concatenating
[mems; x] before projecting (as the reference does, model.py:283-289) forces
XLA to materialize and re-lay-out the whole 1024-deep memory every layer and
micro-batch (~20 ms/step of pure copies at the training shape); the halves
are joined lane-wise in VMEM for the cost of one small copy per program.

THE BD TERM IS A MATMUL, NOT A SHIFT.  The reference computes the
query-position interaction by scoring queries against a distance-indexed
table and then re-aligning rows (``_rel_shift``, model.py:251-265); v1/v2 of
this kernel did the same with log2(T) masked lane-rotations per program,
which profiling showed to be ~40% of the whole forward (the kernel is
VPU-bound; the MXU sits idle).  But the relative-position embedding is a
SINUSOID, so by the angle-addition identities

    emb(a - j) = [sin w(a-j); cos w(a-j)]
               = [sin wa * cos wj - cos wa * sin wj;
                  cos wa * cos wj + sin wa * sin wj]

the BD score factors exactly:  with u = qr^T W_r  (the position projection
applied to the query),

    BD[i, j] = u[i] . emb(M + i - j) = phi(i) . psi(j)

where phi combines u with per-QUERY trig factors (tiny [T, 512] elementwise
work) and psi is a per-KEY trig basis shared by every head, batch row, layer
and micro-batch.  BD = phi @ psi becomes one rank-512 MXU matmul per program
— zero lane rotations, and the ring-buffer re-alignment of v2's BD becomes a
free column gather of psi OUTSIDE the kernel.  (Requires clamp_len <= 0,
which is the reference's configuration; a clamped sinusoid is not separable.)

Per program (grid (B, H)):

    AC   = qw^T [k_mem | k_win]              # [T, K], f32 accumulation
    u    = qr^T W_r[h]                       # [T, 512]
    phi  = trig-combine(u, trigA)            # [T, 512], elementwise
    BD   = phi @ psi                         # [T, K], MXU
    S    = AC + BD + mask[reset_b]           # scale folded into qw/qr outside
    O    = [v_mem | v_win] @ dropout(softmax_rows(S))^T

The additive NEG_INF mask (causal / invalid-ring-slot / reset / same_length)
is PRECOMPUTED outside as a [2, T, K] table (normal and reset-row variants,
shared by every layer and micro-batch of a step shape) and stays VMEM-resident
across the whole grid, as do psi, trigA and W_r — the in-kernel mask
arithmetic of v1 cost more VPU passes than the softmax itself.  The softmax
denominator is folded into the dropout select, so no separate [T, K] divide
happens.

Backward is a custom VJP that recomputes the forward in VMEM (flash-style)
and emits the FUSED q cotangent (content + position paths in one
concatenated-contraction matmul — the bias fold lives inside the VJP
boundary, so the separate dqr array never exists and the r_w_bias/r_r_bias
gradients come out as two extra lanes of the dW_r output), dk/dv (memory
and window halves separately) and per-(b,h) dW_r partials (reduced over
batch outside the kernel — XLA's reduction is faster than sequential-grid
accumulation).
Attention dropout draws its mask once, in the forward, and SIGN-ENCODES it
into the probability checkpoint (probabilities are non-negative, so the
sign bit is free) — the backward decodes |c| / max(c, 0) and never touches
the PRNG.

Positional dropout: the reference drops the distance-indexed sinusoid table
before projecting it (model.py:588-592 drop(pos_emb)).  Here the equivalent
regularizer drops the KEY-indexed trig basis psi (same tensor family, same
rate, applied once per forward and shared across layers) — the
distance-indexed form does not factor through the angle-addition identity.
Deterministic evaluation is exactly equivalent either way.

Numerics match the XLA path to bf16/f32 tolerance (tests/test_fused_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

def _vmem_limit() -> int:
    """Mosaic scoped-vmem cap for the attention kernels (bytes).

    The default Mosaic limit is 16 MB; the memory-fused backward sits right
    at it (16.17 MB with the blocked kv operands) and hp=10 / COMMU_FWD_RP=2
    need more.  v5e cores have 128 MB of physical VMEM — the 100 MB default
    admits the two-row backward (COMMU_BWD_RP=2, ~1 ms/step faster than the
    round-3 40 MB / one-row defaults in interleaved probes; the cap is
    permissive, not a reservation).  COMMU_VMEM_MB overrides (read at trace
    time so perf probes can vary it per build; older TPUs with 16 MB VMEM
    need it lowered along with the rp/hp knobs)."""
    import os
    return int(os.environ.get("COMMU_VMEM_MB", "100")) * 1024 * 1024

def _fpad(d_model: int) -> int:
    """Frequency-lane padding: the d_model/2 frequencies are padded to a
    multiple of 128 lanes so the sin/cos halves of u / phi / trigA / psi
    split at a tile boundary (250 -> 256 for the reference d_model=500)."""
    half = d_model // 2
    return max(128, -(-half // 128) * 128)


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# --- interpret-mode PRNG emulation ------------------------------------------
# pltpu.prng_seed / prng_random_bits have no lowering rule off-TPU, which
# used to force every dropout>0 kernel path (and the driver's multichip
# dryrun) to be tested dropout-free on CPU (VERDICT r3 weak #4).  Off-TPU the
# helpers below emulate the stateful API with a splitmix32-style hash of
# (seed, draw counter, element index): deterministic per seed, uniform enough
# for Bernoulli masks, seed-varying — the REAL generator's distribution is
# certified on-chip by scripts/verify_tpu.py (dropout_prng check).  The
# trace-time dict is safe because every kernel call site seeds before
# drawing within one kernel trace.
_INTERP_PRNG = {"seed": None, "calls": 0}


def _prng_seed(seed) -> None:
    if not _interpret():
        pltpu.prng_seed(seed)
        return
    _INTERP_PRNG["seed"] = jnp.asarray(seed).astype(jnp.uint32)
    _INTERP_PRNG["calls"] = 0


def _prng_random_bits(shape) -> jnp.ndarray:
    if not _interpret():
        return pltpu.prng_random_bits(shape)
    assert _INTERP_PRNG["seed"] is not None, "prng_random_bits before seed"
    _INTERP_PRNG["calls"] += 1
    x = jnp.zeros(shape, jnp.uint32)
    stride = jnp.uint32(1)
    for axis in range(len(shape) - 1, -1, -1):
        x = x + jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * stride
        stride = stride * jnp.uint32(shape[axis])
    x = x + _INTERP_PRNG["seed"] * jnp.uint32(0x9E3779B9) \
        + jnp.uint32(_INTERP_PRNG["calls"]) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _inv_freq(d_model: int) -> jnp.ndarray:
    """Reference frequencies (model.py:141): 1/10000^(2f/d), f = 0..d/2-1."""
    return 1.0 / (10000.0 ** (
        jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model))


def query_trig_table(t: int, m_cap: int, d_model: int,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """trigA [T, 512]: per-query factors [sin(w*(M+i)) | cos(w*(M+i))],
    each half padded 250 -> 256 lanes."""
    a = jnp.arange(t, dtype=jnp.float32) + float(m_cap)          # [T]
    ang = jnp.outer(a, _inv_freq(d_model))                       # [T, 250]
    pad = _fpad(d_model) - ang.shape[1]
    return jnp.concatenate([
        jnp.pad(jnp.sin(ang), ((0, 0), (0, pad))),
        jnp.pad(jnp.cos(ang), ((0, 0), (0, pad))),
    ], axis=1).astype(dtype)


def key_trig_basis(k_len: int, d_model: int,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """psi [512, K]: per-key basis [cos(w*j) ; sin(w*j)] over RIGHT-ALIGNED
    key indices j (memory j in [0, M), window j in [M, M+T))."""
    j = jnp.arange(k_len, dtype=jnp.float32)
    ang = jnp.outer(_inv_freq(d_model), j)                       # [250, K]
    pad = _fpad(d_model) - ang.shape[0]
    return jnp.concatenate([
        jnp.pad(jnp.cos(ang), ((0, pad), (0, 0))),
        jnp.pad(jnp.sin(ang), ((0, pad), (0, 0))),
    ], axis=0).astype(dtype)


def ring_psi(psi_logical: jnp.ndarray, t: int, mem_count, head) -> jnp.ndarray:
    """Permute psi's memory columns from right-aligned logical order into
    RING order (slot j holds logical token l = (j - start) mod M; its
    right-aligned index is M - count + l).  Invalid slots (l >= count) point
    out of range and are clipped — their scores are masked anyway."""
    k_len = psi_logical.shape[1]
    m_cap = k_len - t
    if m_cap == 0:
        return psi_logical
    start = jnp.mod(head - mem_count, m_cap)
    l = jnp.mod(jnp.arange(m_cap) - start, m_cap)
    idx = jnp.clip(m_cap - mem_count + l, 0, k_len - 1)
    return jnp.concatenate(
        [jnp.take(psi_logical, idx, axis=1), psi_logical[:, m_cap:]], axis=1)


def pack_r_kernel(r_kernel: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """r_net parameter [d_model, H*dh] -> kernel operand W_r [H, dh, 512]:
    transposed, with the sin rows (e < 250) and cos rows (e >= 250) each
    padded to 256 so they align with trigA / u halves."""
    d_model = r_kernel.shape[0]
    half = d_model // 2
    wrt = r_kernel.reshape(d_model, num_heads, -1).transpose(1, 2, 0)
    pad = _fpad(d_model) - half
    return jnp.concatenate([
        jnp.pad(wrt[..., :half], ((0, 0), (0, 0), (0, pad))),
        jnp.pad(wrt[..., half:], ((0, 0), (0, 0), (0, pad))),
    ], axis=2)


def build_mask_bias(t: int, m_cap: int, mem_count, head, same_length: bool,
                    dtype=jnp.bfloat16):
    """Additive attention-mask table [2, T, M+T] in RING coordinates.

    Index 0: normal rows — causal (window columns), empty-ring-slot, and
    optionally same_length blocking; index 1: reset rows (all memory columns
    additionally blocked).  Memory slot j holds the logical (oldest=0) token
    l = (j - start) mod M.  Semantics mirror the reference's mask construction
    (commu/model/model.py:549-574); NEG_INF is exactly representable in bf16
    (same exponent range as f32), so the table travels at half width.
    """
    k_len = m_cap + t
    i = jax.lax.broadcasted_iota(jnp.int32, (t, k_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, k_len), 1)
    mem_col = j < m_cap
    if m_cap > 0:
        start = jnp.mod(head - mem_count, m_cap)
        l = jnp.mod(j - start, m_cap)
    else:
        l = j
    blocked = (~mem_col) & (j >= m_cap + i + 1)          # causal, window only
    blocked |= mem_col & (l >= mem_count)                # empty ring slots
    if same_length:
        mask_len = mem_count + t - m_cap
        shift = t - jnp.maximum(mask_len, 0)
        blocked |= mem_col & (l <= i - shift)
    normal = jnp.where(blocked, NEG_INF, 0.0)
    reset_row = jnp.where(blocked | mem_col, NEG_INF, 0.0)
    return jnp.stack([normal, reset_row]).astype(dtype)


def _dropout_bits() -> int:
    """COMMU_DROPOUT_BITS: bits of randomness per dropout decision (16
    default, 8 opt-in).  ``prng_random_bits`` cost scales with uint32
    words, so 8-bit draws quarter the mask-generation volume the original
    full-width draws paid (16-bit halved it).  The keep probability
    quantizes to 2^-bits; ``effective_dropout_p`` exposes the EXACT
    realized rate so every keep-scale stays unbiased (at 8 bits the
    quantization is visible: p=0.1 realizes 26/256 = 0.10156 — a
    hyperparameter-level shift whose training impact is gated by the same
    convergence differential as the int8 levers)."""
    import os
    return int(os.environ.get("COMMU_DROPOUT_BITS", "16"))


def effective_dropout_p(dropout_p: float) -> float:
    """The exact Bernoulli rate ``random_keep`` realizes for ``dropout_p``
    under the active draw width — ALL keep-scales must divide by
    ``1 - effective_dropout_p(p)`` so kept values stay unbiased."""
    if not dropout_p:
        return 0.0
    if _dropout_bits() == 8:
        return min(255, round(dropout_p * 256.0)) / 256.0
    return min(0xFFFF, round(dropout_p * 65536.0)) / 65536.0


def keep_scale_for(dropout_p: float, train: bool) -> float:
    """1 / keep-probability at the realized (quantized) dropout rate."""
    if not train or dropout_p <= 0.0:
        return 1.0
    return 1.0 / (1.0 - effective_dropout_p(dropout_p))


def random_keep(shape, dropout_p):
    """Bernoulli(1 - p) keep mask from reduced-width prng draws.

    ``pltpu.prng_random_bits`` cost scales with the number of uint32 words;
    dropout-mask generation is the dominant dropout cost (measured ~10 ms of
    a ~101 ms step at the reference rates, fwd + bwd regeneration).  Two
    16-bit halves per word halve that volume (quantizing the keep
    probability to 2^-16, |Δp| <= 7.7e-6); COMMU_DROPOUT_BITS=8 packs FOUR
    8-bit decisions per word (rate exactly t/256 on every path — fallback
    paths compare wider draws against a width-scaled threshold, spending
    draw volume but never changing the rate).  The split planes land in a
    fixed position permutation of the mask (iid Bernoulli is
    permutation-invariant, and the forward and backward both derive the
    mask through this function from the same seed, so they always agree).
    Falls back to wider draws when an axis does not split tile-cleanly."""
    r, c = shape
    if _dropout_bits() == 8:
        t8 = jnp.uint32(min(255, round(dropout_p * 256.0)))
        if c % 4 == 0 and (c // 4) % 128 == 0:
            bits = _prng_random_bits((r, c // 4))
            parts = [(bits >> jnp.uint32(s)) & jnp.uint32(0xFF)
                     for s in (0, 8, 16, 24)]
            return jnp.concatenate(parts, axis=1) >= t8
        if r % 4 == 0:
            bits = _prng_random_bits((r // 4, c))
            parts = [(bits >> jnp.uint32(s)) & jnp.uint32(0xFF)
                     for s in (0, 8, 16, 24)]
            return jnp.concatenate(parts, axis=0) >= t8
        # same 1/256-quantized rate at half / full draw volume
        if c % 2 == 0 and (c // 2) % 128 == 0:
            bits = _prng_random_bits((r, c // 2))
            halves = jnp.concatenate([bits & jnp.uint32(0xFFFF),
                                      bits >> jnp.uint32(16)], axis=1)
            return halves >= (t8 << jnp.uint32(8))
        if r % 2 == 0:
            bits = _prng_random_bits((r // 2, c))
            halves = jnp.concatenate([bits & jnp.uint32(0xFFFF),
                                      bits >> jnp.uint32(16)], axis=0)
            return halves >= (t8 << jnp.uint32(8))
        # compare on the MASKED high 16 bits: Mosaic lowers the 32-bit >=
        # as a SIGNED compare, so an unmasked raw-draw comparison drops
        # ~0.5+p instead of p on the chip (caught by scripts/verify_tpu.py
        # check 5b; the tile-clean paths above are immune — every operand
        # is masked into [0, 2^16) before comparing)
        bits = _prng_random_bits(shape)
        return ((bits >> jnp.uint32(16)) & jnp.uint32(0xFFFF)) \
            >= (t8 << jnp.uint32(8))
    t16 = jnp.uint32(min(0xFFFF, round(dropout_p * 65536.0)))
    # concatenate the u32 HALF-VALUES, not the boolean comparisons — Mosaic
    # cannot concatenate i1 vregs ("Invalid vector register cast").  (The
    # sublane-split variant — halves stacked on axis 0 — was probed in
    # round 4 on the theory that this lane concat's mid-vreg seam at
    # c/2 = 576 costs a shuffle; it measured the same to slightly worse,
    # so the original order stands.)
    if c % 2 == 0 and (c // 2) % 128 == 0:
        bits = _prng_random_bits((r, c // 2))
        halves = jnp.concatenate([bits & jnp.uint32(0xFFFF),
                                  bits >> jnp.uint32(16)], axis=1)
        return halves >= t16
    if r % 2 == 0:
        bits = _prng_random_bits((r // 2, c))
        halves = jnp.concatenate([bits & jnp.uint32(0xFFFF),
                                  bits >> jnp.uint32(16)], axis=0)
        return halves >= t16
    # masked high-16-bit compare for the same signed-lowering reason as the
    # 8-bit full-width path above (rate t16/65536 — the same quantization
    # as the half-width paths, so every 16-bit path realizes one rate)
    bits = _prng_random_bits(shape)
    return ((bits >> jnp.uint32(16)) & jnp.uint32(0xFFFF)) >= t16


def _trig_combine(u, trig_a):
    """phi [T, 2F] such that phi . psi[:, j] == u . emb(a - j)."""
    f = u.shape[1] // 2
    u_s, u_c = u[:, :f], u[:, f:]
    s_a = trig_a[:, :f].astype(u.dtype)
    c_a = trig_a[:, f:].astype(u.dtype)
    phi_cos = u_s * s_a + u_c * c_a          # pairs with cos(w j)
    phi_sin = u_c * s_a - u_s * c_a          # pairs with sin(w j)
    return jnp.concatenate([phi_cos, phi_sin], axis=1)


def _trig_combine_bwd(dphi, trig_a):
    """Transpose of _trig_combine in u (the trig factors are orthogonal
    rotations, so the adjoint is the opposite rotation)."""
    f = dphi.shape[1] // 2
    d_cos, d_sin = dphi[:, :f], dphi[:, f:]
    s_a = trig_a[:, :f].astype(dphi.dtype)
    c_a = trig_a[:, f:].astype(dphi.dtype)
    du_s = d_cos * s_a - d_sin * c_a
    du_c = d_cos * c_a + d_sin * s_a
    return jnp.concatenate([du_s, du_c], axis=1)


def _head_kv(km_ref, kw_ref, vm_ref, vw_ref, hh, rr=0):
    """Assemble one head's k/v [dh, K] in VMEM from the blocked memory slabs
    ([rp, R, hp, dh, Tb] ring layout) and the window half.  ``rr`` selects
    the local batch row when the forward runs more than one row per
    program (COMMU_FWD_RP)."""
    if km_ref is not None:
        r_blocks = km_ref.shape[1]
        k = jnp.concatenate(
            [km_ref[rr, r, hh] for r in range(r_blocks)] + [kw_ref[rr, hh]],
            axis=1)                                  # [dh, K]
        v = jnp.concatenate(
            [vm_ref[rr, r, hh] for r in range(r_blocks)] + [vw_ref[rr, hh]],
            axis=1)
    else:
        k = kw_ref[rr, hh]
        v = vw_ref[rr, hh]
    return k, v


def _fold_q(q_ref, rwbs_ref, rrbs_ref, h, hh, scale, rr=0):
    """The two query streams, IN-KERNEL: qw = q*scale + rwb*scale (content)
    and qr likewise (position).  The scaled biases arrive as resident
    [H, dh, 1] blocks (``_scaled_biases``) broadcast over the T lanes —
    folding in-kernel removes the per-layer XLA fold fusion AND halves the
    q-stream HBM traffic (one q operand instead of qw + qr, forward and
    backward; ~130 MB/layer at the training shape)."""
    q = q_ref[rr, hh, :, :]                          # [dh, T]
    qs = q * q.dtype.type(scale)
    return qs + rwbs_ref[h], qs + rrbs_ref[h]


def _bd_int8() -> bool:
    """COMMU_BD_INT8=1 (opt-in): compute the forward BD term on the MXU's
    int8 path.  The rank-512 BD matmul is 36 of the forward's 58 MXU passes
    and int8 runs at 2x the bf16 rate on v5e (394 vs 197 TOPS), so halving
    its depth is worth ~1 ms/layer of forward floor.  Quantization: psi
    (entries in [-1, 1]) is quantized once per layer-step outside the kernel
    at a fixed 1/127 scale and passed as an EXTRA forward-only operand; phi
    is quantized in-kernel with a per-row absmax scale; the int32
    accumulator is exact, so the only error is the two operand roundings
    (~1% RMS on the BD component vs ~0.1% for bf16).  The BACKWARD is
    untouched — it restores the checkpoint and differentiates through the
    bf16 psi, so gradients see the same math as the default path modulo the
    forward's slightly different probabilities.  OFF by default: the
    repository's parity tolerances are calibrated for bf16; enable for
    throughput-first training after checking the convergence evidence
    (see BASELINE.md)."""
    import os
    return os.environ.get("COMMU_BD_INT8", "0") == "1"


def quantize_psi_int8(psi: jnp.ndarray) -> jnp.ndarray:
    """psi [512, K] (entries in [-1, 1]) -> int8 at a fixed 1/127 scale."""
    return jnp.clip(jnp.round(psi.astype(jnp.float32) * 127.0),
                    -127, 127).astype(jnp.int8)


def _bd_int8_bwd() -> bool:
    """COMMU_BD_INT8_BWD=1 (opt-in): compute the BACKWARD dphi matmul
    (dphi = ds @ psi^T — 36 of the backward's ~106 MXU passes per
    (row, head) unit at the training shape) on the MXU's int8 path.
    Quantization mirrors the forward lever (``_bd_int8``): psi at the fixed
    1/127 scale as an extra resident operand, ds with a per-QUERY-row
    absmax scale computed in-kernel, exact int32 accumulation.  The
    roundings put ~1% RMS on dphi — which feeds only the position-path
    query cotangent and dW_r/bias gradients (the content path dk/dq-AC and
    dv are untouched) — gradient noise well below SGD batch noise, but a
    semantic deviation from the bf16 path, so: OFF at the kernel layer,
    promoted by the production-training entry points only with committed
    convergence evidence (see BASELINE.md / README knob table)."""
    import os
    return os.environ.get("COMMU_BD_INT8_BWD", "0") == "1"


def _int8_dq() -> bool:
    """COMMU_INT8_DQ=1 (opt-in, probe lever): the fused dq concatenated
    contraction ([dh, K+512] x [T, K+512], 13 of the backward's MXU passes
    per unit) on the int8 path.  Both operands quantize along their OUTPUT
    dims (kw_cat per dh-row, dsu per T-row absmax), so the scale
    factorization is exact — only the two roundings approximate.  Touches
    the WHOLE query cotangent (content + position), i.e. a content-path
    gradient approximation — stricter promotion bar than the BD levers."""
    import os
    return os.environ.get("COMMU_INT8_DQ", "0") == "1"


def _int8_dk() -> bool:
    """COMMU_INT8_DK=1 (opt-in, probe lever): dk = qw @ ds ([dh, T] x
    [T, K], 9 passes per unit) on the int8 path — qw per dh-row absmax,
    ds per K-COLUMN absmax (the contraction is over T, so scales must ride
    the output dims).  Content-path approximation like _int8_dq."""
    import os
    return os.environ.get("COMMU_INT8_DK", "0") == "1"


def _quant_rows(x_f32, eps=1e-30):
    """(int8 per-ROW absmax quantization, f32 row scales [R, 1])."""
    amax = jnp.max(jnp.abs(x_f32), axis=1, keepdims=True)
    sc = jnp.maximum(amax, eps) * (1.0 / 127.0)
    return jnp.round(x_f32 * (1.0 / sc)).astype(jnp.int8), sc


def _bd_matmul(phi_f32, psi_ref, psiq_ref, out_dtype):
    """BD = phi @ psi, on the int8 MXU path when ``psiq_ref`` is present
    (see _bd_int8), else bf16.  Returns f32 [T, K]."""
    if psiq_ref is not None:
        amax = jnp.max(jnp.abs(phi_f32), axis=1, keepdims=True)      # [T,1]
        qscale = 127.0 / jnp.maximum(amax, 1e-20)
        phi_q = jnp.round(phi_f32 * qscale).astype(jnp.int8)
        bd_i = jax.lax.dot_general(phi_q, psiq_ref[:, :],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        return bd_i.astype(jnp.float32) * (amax * (1.0 / (127.0 * 127.0)))
    phi = phi_f32.astype(out_dtype)
    return jax.lax.dot_general(phi, psi_ref[:, :], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_scores(scalar_ref, q_ref, rwbs_ref, rrbs_ref, wr_ref, trig_ref,
                 psi_ref, mask_ref, b, h, hh, k, v, scale, rr=0,
                 psiq_ref=None):
    """Score phase (MXU): masked scores s f32 [T, K] plus this head's v.

    The content/position biases AND the 1/sqrt(dh) scale are folded into the
    two query streams in-kernel (``_fold_q``).  Operands stay in their
    storage dtype (bf16 in training): the MXU multiplies bf16 natively with
    f32 accumulation via preferred_element_type — casting to f32 first would
    halve throughput.
    """
    qw, qr = _fold_q(q_ref, rwbs_ref, rrbs_ref, h, hh, scale, rr)
    w_r = wr_ref[h]                                  # [dh, 512] (resident)

    ac = jax.lax.dot_general(qw, k, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [T,K]
    u = jax.lax.dot_general(qr, w_r, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)       # [T,512]
    phi_f32 = _trig_combine(u, trig_ref[:, :])
    bd = _bd_matmul(phi_f32, psi_ref, psiq_ref, qr.dtype)             # [T,K]

    reset_b = scalar_ref[1 + b]
    s = ac + bd + mask_ref[reset_b].astype(jnp.float32)
    return s, v


def _softmax_clamp() -> bool:
    """COMMU_SOFTMAX=clamp replaces the row-max subtraction with a fixed
    clamp at +60 (exp(60) ~ 1e26; a 1152-key row sum stays < 1e30, far from
    f32 overflow): softmax is shift-invariant, so for rows whose scores stay
    in (-87, 60) the result is bit-comparable, and it saves a cross-lane max
    reduction plus a full [T, K] f32 subtract per head in the forward's
    VPU-bound phase (~1 ms/step measured).

    Default is ``max``: a 150-step real-data bisect on the v5e chip showed
    clamp going NaN at step 95 while max stayed finite — early-training
    score drift pushes entire rows below exp's f32 underflow (~-87), the
    unsubtracted denominator hits exactly 0, and 1/0 propagates.  The
    subtracting form's denominator is always >= exp(0) = 1.  Clamp mode now
    carries a denominator guard (a pathological row degrades to zero
    attention output instead of NaN), but the saturated rows still lose
    their gradient, so it stays opt-in for inference-like or
    well-conditioned workloads."""
    import os
    return os.environ.get("COMMU_SOFTMAX", "max") == "clamp"


def _defer_norm() -> bool:
    """COMMU_DEFER_NORM=1: the softmax normalization never touches the
    [T, K] probability plane.  The forward's output matmul runs on the
    UNNORMALIZED (dropout-selected) exp values and the row normalizer folds
    into the [dh, T] output columns AFTER the matmul (row-scaling of probs ==
    column-scaling of o, and the MXU accumulates in f32 so the fold is
    exact); the checkpoint stores the sign-encoded unnormalized exps and the
    backward reconstructs the denominator with a rowsum of |c|.

    MEASURED SLOWER at the training shape (96.5 vs 95.4 ms/step median,
    interleaved probe, round 4): the ~2 full-plane VPU passes it removes
    from the forward were cheaper than the rowsum + broadcast-mul passes it
    adds to the backward — the backward sits ~1% off its MXU pass floor, so
    its VPU phases are NOT entirely free.  Default OFF; kept as a probe
    lever for other shapes (numerics are certified in both modes by
    tests/test_fused_attention.py and scripts/verify_tpu.py)."""
    import os
    return os.environ.get("COMMU_DEFER_NORM", "0") == "1"


def _scale_hoist() -> bool:
    """COMMU_SCALE_HOIST=1 (probe lever): apply the dropout keep-scale to
    the attention OUTPUT columns ([dh, T]) instead of the probability plane
    ([T, K]) in the forward's non-deferred path, and derive the matmul
    operand from the sign-encoded checkpoint (max(chk, 0)) — one [T, K]
    select + max replaces two selects + a plane multiply.  The checkpoint
    and the backward are untouched (chk stores UNSCALED probabilities in
    both modes).  Measured NEUTRAL on v5e (five-round interleaved A/B at
    the shipped int8/8-bit-dropout defaults: 87.10 vs 87.18 ms/step
    median, inside the ±0.5 ms drift band) — the plane multiply it
    removes was already hidden under the pipelined MXU work.  Default
    OFF; kept for chips/shapes where the VPU softmax phase is exposed."""
    import os
    return os.environ.get("COMMU_SCALE_HOIST", "0") == "1"


def _attn_softmax(scalar_ref, s, b, h, *, t, k_len, dropout_p, train):
    """Softmax phase (VPU): (matmul operand, checkpoint value, col_scale).

    The checkpoint SIGN-ENCODES the dropout mask (values are non-negative,
    so the sign bit is free): c = v where kept, -v where dropped, with v the
    normalized probabilities (or the raw exps under ``_defer_norm``).  The
    backward decodes the keep mask from the sign and never touches the PRNG.
    (A dropped v == 0 loses the sign, but the post-dropout probability there
    is 0 either way.)  ``col_scale`` is None when all scaling happened
    in-plane, the [T, 1] normalizer under ``_defer_norm``, or a python
    float (the hoisted keep-scale) under ``_scale_hoist``.
    """
    if _softmax_clamp():
        e = jnp.exp(jnp.minimum(s, 60.0))
        # guard: if every score in a row underflows exp (s < ~-87 across
        # the row), the unsubtracted denominator is exactly 0 — emit zero
        # probabilities for that row instead of 1/0 = inf -> NaN
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
    inv_denom = 1.0 / denom                                          # [T,1]
    keep_scale = keep_scale_for(dropout_p, train)
    if _defer_norm():
        if train and dropout_p > 0.0:
            _prng_seed(scalar_ref[0] + b * 4096 + h)
            keep = random_keep((t, k_len), dropout_p)
            chk = jnp.where(keep, e, -e)
            # the matmul operand IS the decoded checkpoint (max(chk, 0)):
            # one select feeds both, and the forward's matmul input matches
            # the backward's reconstruction bit-for-bit after the bf16 cast
            operand = jnp.maximum(chk, 0.0)
        else:
            operand = chk = e
        return operand, chk, inv_denom * keep_scale
    p_clean = e * inv_denom
    if train and dropout_p > 0.0:
        _prng_seed(scalar_ref[0] + b * 4096 + h)
        keep = random_keep((t, k_len), dropout_p)
        chk = jnp.where(keep, p_clean, -p_clean)
        if _scale_hoist():
            # fold the scalar keep-scale into the [dh, T] output instead of
            # the [T, K] probability plane (K/dh ~ 23x less multiply
            # volume), and reuse the checkpoint select for the operand —
            # one select + max instead of two selects + a plane multiply.
            # Mathematically identical ((s*P) @ v == s*(P @ v)); bit-level
            # the scale now applies after the f32 matmul instead of before
            # the bf16 operand cast.
            return jnp.maximum(chk, 0.0), chk, keep_scale
        probs = jnp.where(keep, p_clean * keep_scale, 0.0)
    else:
        probs = chk = p_clean
    return probs, chk, None


def _fwd_body(scalar_ref, q_ref, rwbs_ref, rrbs_ref, wr_ref, trig_ref,
              psi_ref, mask_ref, o_ref, e_ref, head_kv, b0, hg,
              *, t, k_len, dropout_p, train, hp, scale, rp=1,
              psiq_ref=None):
    """Shared forward body: software-pipelined loop over (row, head) units
    with ``head_kv(rr, hh) -> (k, v)`` (either DMA'd pre-projected halves
    or the window-only case).  With COMMU_FWD_RP > 1 the program covers
    ``rp`` batch rows; units iterate heads-outer / rows-inner so adjacent
    units share no operands at all (different rows), giving the scheduler
    fully independent MXU work to overlay on every VPU softmax phase.
    Per-row dropout seeds and reset rows use the GLOBAL row index, so the
    outputs are bitwise-identical for every rp."""
    def finish(rr, hh, h, s, v, b):
        operand, chk, col_scale = _attn_softmax(
            scalar_ref, s, b, h, t=t, k_len=k_len, dropout_p=dropout_p,
            train=train)
        o = jax.lax.dot_general(v, operand.astype(v.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [dh,T]
        if col_scale is not None:
            if isinstance(col_scale, float):
                # hoisted scalar keep-scale (COMMU_SCALE_HOIST)
                o = o * col_scale
            else:
                # deferred normalization: row-scale of probs == col-scale
                # of o
                o = o * col_scale.reshape(1, t)
        o_ref[rr, hh, :, :] = o.astype(o_ref.dtype)
        if e_ref is not None:
            # the VJP forward checkpoints the NORMALIZED probabilities with
            # the dropout mask sign-encoded, so the backward never re-runs
            # the score matmuls, the softmax normalization, NOR the dropout
            # PRNG — at bf16 this is 295 KB per program, far cheaper than
            # recomputing AC + BD + u
            e_ref[rr, hh, :, :] = chk.astype(e_ref.dtype)

    # software-pipelined units: unit u+1's score matmuls (MXU) are emitted
    # BEFORE unit u's softmax/output phase, giving the scheduler a full
    # unit of independent MXU work to overlay on each VPU phase (the
    # unrolled-in-order form measured ~30% below the overlapped floor)
    depth = _pipe_depth("fwd")
    pend = []
    for hh in range(hp):
        for rr in range(rp):
            h = hg * hp + hh
            b = b0 * rp + rr
            k, v = head_kv(rr, hh)
            s, v = _attn_scores(scalar_ref, q_ref, rwbs_ref, rrbs_ref,
                                wr_ref, trig_ref, psi_ref, mask_ref, b, h,
                                hh, k, v, scale, rr, psiq_ref=psiq_ref)
            pend.append((rr, hh, h, s, v, b))
            if len(pend) > depth:
                finish(*pend.pop(0))
    for st in pend:
        finish(*st)


def _fwd_kernel(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref, kw_ref,
                vm_ref, vw_ref, wr_ref, trig_ref, psi_ref, mask_ref, *rest,
                t, k_len, dropout_p, train, hp, scale, rp=1):
    # rest = ([psiq (int8 BD operand, _bd_int8),] o_ref[, e_ref])
    psiq_ref = None
    if _bd_int8():
        psiq_ref, rest = rest[0], rest[1:]
    o_ref = rest[0]
    e_ref = rest[1] if len(rest) > 1 else None
    b0, hg = pl.program_id(0), pl.program_id(1)
    _fwd_body(scalar_ref, q_ref, rwbs_ref, rrbs_ref, wr_ref, trig_ref,
              psi_ref, mask_ref, o_ref, e_ref,
              lambda rr, hh: _head_kv(km_ref, kw_ref, vm_ref, vw_ref, hh, rr),
              b0, hg, t=t, k_len=k_len, dropout_p=dropout_p, train=train,
              hp=hp, scale=scale, rp=rp, psiq_ref=psiq_ref)


def proj_in_fwd() -> bool:
    """COMMU_PROJ_IN_FWD=1: project the XL memory's k/v INSIDE the forward
    attention kernel (reading the raw ring buffer once per batch row and
    scoring against the projected slabs while they are still in VMEM),
    writing the projected halves out for the backward kernel to reuse.
    Removes the standalone projection kernel's k/v HBM round trip into the
    forward (~260 MB/layer/step of reads) without duplicating projection
    FLOPs in the backward — the earlier project-inside-fwd-AND-bwd
    experiment regressed for exactly that duplication."""
    import os
    return os.environ.get("COMMU_PROJ_IN_FWD", "0") == "1"


def _fwd_kernel_proj(scalar_ref, q_ref, rwbs_ref, rrbs_ref, mem_ref, wk_ref,
                     wv_ref, kw_ref, vw_ref, wr_ref, trig_ref, psi_ref,
                     mask_ref, o_ref, km_out_ref, vm_out_ref, e_ref=None,
                     *, t, k_len, dropout_p, train, hp, heads, scale):
    """Forward with the memory k/v projection fused in.  mem_ref is this
    layer's raw ring block [1, R, 1, D, Tb]; wk/wv are the [D, H*dh]
    projection weights (VMEM-resident).  The projected slabs are scored
    directly from VMEM and also written to km/vm outputs (full-head blocks,
    indexed by the batch row only) so the backward reuses them without
    re-projecting.  With hp < heads the projection recomputes per head
    group (the duplicate writes hit the same resident block — harmless; the
    production path runs all heads in one group)."""
    b, hg = pl.program_id(0), pl.program_id(1)
    r_blocks = mem_ref.shape[1]
    t_blk = mem_ref.shape[4]
    dh = q_ref.shape[2]
    k_slabs, v_slabs = [], []
    for r in range(r_blocks):
        m = mem_ref[0, r, 0]                                     # [D, Tb]
        k = jax.lax.dot_general(wk_ref[...], m, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        v = jax.lax.dot_general(wv_ref[...], m, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k3 = k.reshape(heads, dh, t_blk).astype(km_out_ref.dtype)
        v3 = v.reshape(heads, dh, t_blk).astype(vm_out_ref.dtype)
        km_out_ref[0, r] = k3
        vm_out_ref[0, r] = v3
        k_slabs.append(k3)
        v_slabs.append(v3)

    def head_kv(hh):
        if heads // hp == 1:
            # one head group (the production path): hh IS the global head,
            # a static index into the still-live projected slab values
            k = jnp.concatenate([k_slabs[r][hh] for r in range(r_blocks)]
                                + [kw_ref[0, hh]], axis=1)       # [dh, K]
            v = jnp.concatenate([v_slabs[r][hh] for r in range(r_blocks)]
                                + [vw_ref[0, hh]], axis=1)
        else:
            # multiple head groups: the global head index is traced
            # (program_id); values cannot be dynamically indexed, but the
            # freshly-written resident output block can
            h = hg * hp + hh
            k = jnp.concatenate([km_out_ref[0, r, h] for r in range(r_blocks)]
                                + [kw_ref[0, hh]], axis=1)
            v = jnp.concatenate([vm_out_ref[0, r, h] for r in range(r_blocks)]
                                + [vw_ref[0, hh]], axis=1)
        return k, v

    _fwd_body(scalar_ref, q_ref, rwbs_ref, rrbs_ref, wr_ref, trig_ref,
              psi_ref, mask_ref, o_ref, e_ref,
              lambda rr, hh: head_kv(hh),
              b, hg, t=t, k_len=k_len, dropout_p=dropout_p, train=train,
              hp=hp, scale=scale)


def _fused_fwd_proj(q, rwbs, rrbs, mem, layer_idx, wk3, wv3, k_win, v_win,
                    w_r, trig_a, psi, mask, scalars, dropout_p, train, scale,
                    save_e):
    """pallas_call assembly for the projection-fused forward.  Returns
    (out, k_mem, v_mem[, e]) with k_mem/v_mem in the same blocked
    [B, R, H, dh, Tb] layout ``project_mem_kv`` produces."""
    if _bd_int8():
        # the int8-psi extra operand is only plumbed through _fused_fwd;
        # silently measuring bf16 BD here would misattribute probe results
        raise NotImplementedError(
            "COMMU_BD_INT8=1 is not plumbed through the COMMU_PROJ_IN_FWD=1 "
            "path (the quantized-psi operand only exists in _fused_fwd); "
            "unset one of the two flags")
    batch, heads, dh, t = q.shape
    l1, r_blocks, _, d_model, t_blk = mem.shape
    m_cap = r_blocks * t_blk
    k_len = m_cap + t
    hp = heads_per_program(heads)
    fdim = w_r.shape[2]
    dtype = q.dtype
    wk = wk3.reshape(d_model, heads * dh).astype(mem.dtype)
    wv = wv3.reshape(d_model, heads * dh).astype(mem.dtype)

    bh_t = pl.BlockSpec((1, hp, dh, t), lambda b, h, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    mem_spec = pl.BlockSpec((1, r_blocks, 1, d_model, t_blk),
                            lambda b, h, s: (layer_idx, 0, b, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_out = pl.BlockSpec((1, r_blocks, heads, dh, t_blk),
                          lambda b, h, s: (b, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    e_blk = pl.BlockSpec((1, hp, t, k_len), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)

    def resident(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda b, h, s: (0,) * n,
                            memory_space=pltpu.VMEM)

    in_specs = [bh_t, resident(rwbs.shape), resident(rrbs.shape), mem_spec,
                resident(wk.shape), resident(wv.shape), bh_t, bh_t,
                resident(w_r.shape), resident(trig_a.shape),
                resident(psi.shape), resident(mask.shape)]
    out_specs = [bh_t, kv_out, kv_out]
    out_shape = [
        jax.ShapeDtypeStruct((batch, heads, dh, t), dtype),           # o
        jax.ShapeDtypeStruct((batch, r_blocks, heads, dh, t_blk),
                             mem.dtype),                              # k_mem
        jax.ShapeDtypeStruct((batch, r_blocks, heads, dh, t_blk),
                             mem.dtype),                              # v_mem
    ]
    if save_e:
        out_specs.append(e_blk)
        out_shape.append(
            jax.ShapeDtypeStruct((batch, heads, t, k_len), dtype))    # e
    kernel = functools.partial(
        _fwd_kernel_proj, t=t, k_len=k_len, dropout_p=dropout_p,
        train=train, hp=hp, heads=heads, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch, heads // hp),
        in_specs=in_specs, out_specs=out_specs)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(scalars, q, rwbs, rrbs, mem, wk, wv, k_win, v_win, w_r, trig_a, psi,
      mask)
    return outs


def _bwd_kernel(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref, kw_ref,
                vm_ref, vw_ref, wr_ref, trig_ref, psi_ref, mask_ref, *rest,
                t, k_len, dropout_p, train, hp, scale):
    # rest = (do_ref, e_ref, [psiq (int8 dphi operand, _bd_int8_bwd),]
    #         dq_ref, dkm_ref, dkw_ref, dvm_ref, dvw_ref, dwr_ref)
    do_ref, e_ref, rest = rest[0], rest[1], rest[2:]
    psiq_ref = None
    if _bd_int8_bwd():
        psiq_ref, rest = rest[0], rest[1:]
    dq_ref, dkm_ref, dkw_ref, dvm_ref, dvw_ref, dwr_ref = rest
    b, hg = pl.program_id(0), pl.program_id(1)
    m_cap = k_len - t

    def stage_a(h, hh, rr):
        return _bwd_stage_a(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref,
                            kw_ref, vm_ref, vw_ref, do_ref, e_ref, b, h, hh,
                            t=t, k_len=k_len, dropout_p=dropout_p,
                            train=train, scale=scale)

    def finish(rr, hh, h, a):
        dq, dk, dv, dwr_wide = _bwd_stage_b(
            wr_ref, trig_ref, psi_ref, a, h, dropout_p=dropout_p,
            scale=scale, psiq_ref=psiq_ref)
        dq_ref[0, hh, :, :] = dq.astype(dq_ref.dtype)
        if dkm_ref is not None:
            dkm_ref[0, hh, :, :] = dk[:, :m_cap].astype(dkm_ref.dtype)
            dvm_ref[0, hh, :, :] = dv[:, :m_cap].astype(dvm_ref.dtype)
        dkw_ref[0, hh, :, :] = dk[:, m_cap:].astype(dkw_ref.dtype)
        dvw_ref[0, hh, :, :] = dv[:, m_cap:].astype(dvw_ref.dtype)
        dwr_ref[0, hh, :, :] = dwr_wide.astype(dwr_ref.dtype)

    _bwd_pipeline(hp, hg, stage_a, finish)


def _bwd_stage_a(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref, kw_ref,
                 vm_ref, vw_ref, do_ref, e_ref, b, h, hh,
                 *, t, k_len, dropout_p, train, scale, rr=0):
    """Backward stage A for one head: restore the softmax state from the
    checkpointed normalized probabilities and run the first matmul pair
    (dv, dp).
    ``b``/``h`` are LOGICAL batch/head indices (the dropout mask regenerates
    from them, independent of grid order); ``rr`` selects the local batch
    row when the backward runs more than one row per program
    (COMMU_BWD_RP)."""
    qw, qr = _fold_q(q_ref, rwbs_ref, rrbs_ref, h, hh, scale, rr)
    k, v = _head_kv(km_ref, kw_ref, vm_ref, vw_ref, hh, rr)
    c = e_ref[rr, hh, :, :].astype(jnp.float32)                      # [T,K]
    keep_scale = keep_scale_for(dropout_p, train)
    if _defer_norm():
        # checkpoint holds sign-encoded UNNORMALIZED exps: reconstruct the
        # row normalizer here (|c| = e regardless of the dropout sign, so
        # the rowsum is the forward's denominator to bf16 rounding); extra
        # VPU passes, but the backward's VPU is hidden under its matmuls
        e_abs = jnp.abs(c)
        denom = jnp.sum(e_abs, axis=1, keepdims=True)
        inv = 1.0 / jnp.maximum(denom, 1e-30)
        p_clean = e_abs * inv
        probs = (jnp.maximum(c, 0.0) * (keep_scale * inv)
                 if train and dropout_p > 0.0 else p_clean)
    elif train and dropout_p > 0.0:
        # dropout mask sign-encoded in the checkpoint (see _attn_softmax):
        # NO prng in the backward
        p_clean = jnp.abs(c)
        probs = jnp.maximum(c, 0.0) * keep_scale
    else:
        probs = p_clean = c
    do = do_ref[rr, hh, :, :]                                         # [dh,T]

    # dv uses the POST-dropout probabilities (o = dropout(p) @ v)
    probs_c = probs.astype(do.dtype)
    dv = jax.lax.dot_general(do, probs_c, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)     # [dh,K]
    dp = jax.lax.dot_general(do, v, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)     # [T,K]
    return qw, qr, k, dv, dp, p_clean, probs


def _bwd_stage_b(wr_ref, trig_ref, psi_ref, stage_a, h,
                 *, dropout_p, scale, psiq_ref=None):
    """Backward stage B: softmax backward (VPU) and the remaining matmuls
    -> (dq [dh,T], dk [dh,K], dv [dh,K], dwr_wide [dh, 512+128]).

    The content (dq_ac = k ds^T) and position (dqr = w_r du^T) query
    cotangents are computed as ONE concatenated-contraction matmul
    [k | w_r] @ [ds | du]^T: their sum IS the q cotangent (qw and qr both
    derive from q), which removes one M=dh matmul per head plus the whole
    [B, H, dh, T] dqr array from HBM (~66 MB of traffic per layer per step
    at the training shape).  The r_w_bias / r_r_bias gradients — the only
    consumers that needed dq_ac and dqr separately — are the T-sums of
    those products, computed here as cheap VPU reductions
    (sum_T dq_ac = k @ (sum_T ds)) and stashed in two extra lanes of the
    dwr output (columns fdim and fdim+1 of the widened [dh, fdim+128]
    block).  ``scale`` (the 1/sqrt(dh) fold, a compile-time constant) is
    applied in-kernel so no separate elementwise pass rescales dq outside.
    """
    qw, qr, k, dv, dp, p_clean, probs = stage_a
    # dropout backward folded through the softmax backward: with
    # dp~ = keep/(1-p) * dp, the chain  ds = p_clean * (dp~ - rowsum(dp~ *
    # p_clean))  simplifies because p_clean * dp~ == probs * dp (probs are
    # the post-dropout probabilities stage A already built for dv) — one
    # multiply replaces the keep-select plus a second [T, K] multiply.
    # Dropped positions still receive the -p_clean * rowsum term, exactly
    # as in the unfused form (folding the mask into p instead is wrong).
    pd = probs * dp                                                  # [T,K]
    ds = pd - p_clean * jnp.sum(pd, axis=1, keepdims=True)           # [T,K]

    ds_c = ds.astype(k.dtype)
    if _int8_dk():
        # contraction over T: scales ride the output dims — qw per dh-row,
        # ds per K-column ([1, K] lane-wise reduction over sublanes)
        qw_q, sqw = _quant_rows(qw.astype(jnp.float32))          # [dh,T]
        cmax = jnp.max(jnp.abs(ds), axis=0, keepdims=True)       # [1, K]
        scol = jnp.maximum(cmax, 1e-30) * (1.0 / 127.0)
        ds_qc = jnp.round(ds * (1.0 / scol)).astype(jnp.int8)
        dk_i = jax.lax.dot_general(qw_q, ds_qc, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        dk = dk_i.astype(jnp.float32) * sqw * scol               # [dh,K]
    else:
        dk = jax.lax.dot_general(qw, ds_c, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [dh,K]

    if psiq_ref is not None:
        # int8 dphi (_bd_int8_bwd): per-query-row absmax scale on ds, the
        # 1/127-scaled int8 psi as the resident operand, int32 accumulation
        amax = jnp.max(jnp.abs(ds), axis=1, keepdims=True)       # [T,1] f32
        sc = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
        ds_q = jnp.round(ds * (1.0 / sc)).astype(jnp.int8)
        dphi_i = jax.lax.dot_general(ds_q, psiq_ref[:, :],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
        dphi = dphi_i.astype(jnp.float32) * (sc * (1.0 / 127.0))  # [T,512]
    else:
        psi = psi_ref[:, :]
        dphi = jax.lax.dot_general(ds_c, psi, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [T,512]
    du_f = _trig_combine_bwd(dphi, trig_ref[:, :])                   # [T,512]
    du = du_f.astype(k.dtype)
    w_r = wr_ref[h]
    # fused content+position query cotangent: one [dh, K+512] x [T, K+512]
    # contraction instead of two M=dh matmuls
    kw_cat = jnp.concatenate([k, w_r], axis=1)                  # [dh, K+512]
    if _int8_dq():
        # contraction over K+512: both operands quantize along their
        # output dims (exact outer-product scale factorization)
        kw_q, skw = _quant_rows(kw_cat.astype(jnp.float32))
        dsu_q, sdsu = _quant_rows(
            jnp.concatenate([ds, du_f.astype(jnp.float32)], axis=1))
        dq_i = jax.lax.dot_general(kw_q, dsu_q, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        dq = dq_i.astype(jnp.float32) * (skw * scale) * sdsu.reshape(1, -1)
    else:
        dsu = jnp.concatenate([ds_c, du], axis=1)               # [T, K+512]
        dq = jax.lax.dot_general(kw_cat, dsu, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    dwr = jax.lax.dot_general(qr, du, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)    # [dh,512]

    # bias gradients: drwb = scale * sum_T (k ds^T) = scale * k @ sum_T(ds);
    # drrb likewise over du — [dh]-sized VPU reductions, stashed into two
    # extra lanes of the dwr output
    s_ds = jnp.sum(ds, axis=0, keepdims=True)                   # [1, K] f32
    s_du = jnp.sum(du.astype(jnp.float32), axis=0, keepdims=True)  # [1, 512]
    drwb = jnp.sum(k.astype(jnp.float32) * s_ds, axis=1,
                   keepdims=True) * scale                       # [dh, 1]
    drrb = jnp.sum(w_r.astype(jnp.float32) * s_du, axis=1,
                   keepdims=True) * scale
    pad = jnp.zeros((dwr.shape[0], 128 - 2), jnp.float32)
    dwr_wide = jnp.concatenate([dwr, drwb, drrb, pad], axis=1)  # [dh, f+128]
    return dq, dk, dv, dwr_wide


def _pipe_depth(role: str = "fwd") -> int:
    """Heads in flight ahead of the finish phase (COMMU_PIPE_DEPTH; the
    per-direction COMMU_FWD_PIPE / COMMU_BWD_PIPE take precedence).

    Depth 1 measured best while the finish phase was VPU-heavy (round 1);
    after the sign-encoded-checkpoint rewrite shrank the vector phases,
    depth 3 buys ~1.6 ms/step at the training shape (98.3 -> 96.7 ms) —
    deeper lookahead beyond that costs VMEM without more overlap."""
    import os
    env = os.environ.get(f"COMMU_{role.upper()}_PIPE")
    if env:
        return int(env)
    return int(os.environ.get("COMMU_PIPE_DEPTH", "3"))


def _bwd_pipeline(hp, hg, stage_a, finish, rp=1):
    """Software-pipelined (row, head) loop: unit u+1's stage A (checkpoint
    restore + dv/dp matmuls) is emitted BEFORE unit u's stage B,
    interleaving independent MXU and VPU work across units (same reasoning
    as ``_fwd_kernel``; measured ~10% on the whole step).  With
    COMMU_BWD_RP > 1 units iterate heads-outer / rows-inner, mirroring the
    forward's row pairing."""
    depth = _pipe_depth("bwd")
    pend = []
    for hh in range(hp):
        for rr in range(rp):
            h = hg * hp + hh
            pend.append((rr, hh, h, stage_a(h, hh, rr)))
            if len(pend) > depth:
                finish(*pend.pop(0))
    for st in pend:
        finish(*st)



def _scalars(dropout_seed, reset, batch):
    if reset is None:
        reset = jnp.zeros((batch,), dtype=jnp.int32)
    return jnp.concatenate([
        jnp.asarray(dropout_seed, jnp.int32).reshape(1),
        reset.astype(jnp.int32).reshape(batch),
    ])


def _scaled_biases(r_w_bias, r_r_bias, scale, dtype):
    """Pre-scaled bias operands for the in-kernel query fold (``_fold_q``):
    [H, dh, 1] blocks of bias * scale, resident in VMEM for the whole grid.
    The fold itself lives INSIDE the custom-VJP boundary: the backward
    kernel emits the fused q cotangent (dq_ac + dqr, one matmul) plus the
    tiny bias gradients directly, so neither a separate [B, H, dh, T] qw/qr
    pair nor a dqr array ever exists in HBM."""
    rwbs = (r_w_bias.astype(jnp.float32) * scale).astype(dtype)[..., None]
    rrbs = (r_r_bias.astype(jnp.float32) * scale).astype(dtype)[..., None]
    return rwbs, rrbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_core(q, r_w_bias, r_r_bias, k_win, v_win, w_r, trig_a, psi, mask,
               scalars, dropout_p, train, scale):
    """Fused attention over kernel-layout operands, NO XL memory (the
    memory-less special case — priming a fresh sequence; attention over a
    nonempty memory goes through ``fused_core_mem``, whose backward
    accumulates the memory-half weight gradients in-kernel).

    q: [B, H, dh, T] raw query projection; r_w_bias / r_r_bias: [H, dh]
    content/position biases (folded into the two query streams inside, with
    the 1/sqrt(dh) ``scale``); k_win, v_win: [B, H, dh, T]; w_r:
    [H, dh, 512] packed position projection (``pack_r_kernel``); trig_a:
    [T, 512] per-query trig factors (``query_trig_table``); psi: [512, T]
    per-key trig basis (``key_trig_basis``); mask: [2, T, T] additive bias
    from ``build_mask_bias``; scalars: int32 [1 + B] =
    [dropout_seed, reset_rows...].  Returns [B, H, dh, T] in q's dtype.

    Upstream projections should produce these layouts DIRECTLY via
    reshaped-kernel einsums (see RelMultiHeadAttention) — they are the
    lane-dense layouts (token dim on lanes), so neither the projections nor
    the kernel DMAs ever touch the 50->128 lane padding a head-minor layout
    pays.
    """
    rwbs, rrbs = _scaled_biases(r_w_bias, r_r_bias, scale, q.dtype)
    out, _ = _fused_fwd(q, rwbs, rrbs, None, k_win, None, v_win, w_r, trig_a,
                        psi, mask, scalars, dropout_p, train, scale,
                        save_e=False)
    return out


def _mem_kernel(kernel_fn, has_mem):
    """Adapt ref order: kernels take (scalars, q, rwbs, rrbs, [km,] kw,
    [vm,] vw, wr, trig, psi, mask, [do], outs...); without memory km/vm are
    absent."""
    if has_mem:
        return kernel_fn

    def wrapped(scalar_ref, q_ref, rwbs_ref, rrbs_ref, kw_ref, vw_ref, *rest):
        return kernel_fn(scalar_ref, q_ref, rwbs_ref, rrbs_ref, None, kw_ref,
                         None, vw_ref, *rest)
    return wrapped


def _bwd_mem_kernel(kernel_fn, has_mem):
    if has_mem:
        return kernel_fn

    def wrapped(scalar_ref, q_ref, rwbs_ref, rrbs_ref, kw_ref, vw_ref,
                wr_ref, trig_ref, psi_ref, mask_ref, *rest):
        # rest = (do_ref, e_ref, [psiq,] dq_ref, dkw_ref, dvw_ref, dwr_ref)
        pre, rest = rest[:2], rest[2:]
        if _bd_int8_bwd():
            pre, rest = pre + (rest[0],), rest[1:]
        dq_ref, dkw_ref, dvw_ref, dwr_ref = rest
        return kernel_fn(scalar_ref, q_ref, rwbs_ref, rrbs_ref, None, kw_ref,
                         None, vw_ref, wr_ref, trig_ref, psi_ref, mask_ref,
                         *pre, dq_ref, None, dkw_ref, None, dvw_ref,
                         dwr_ref)
    return wrapped


def _mem_cap(k_mem) -> int:
    """Memory capacity M = R*Tb of a blocked [B, R, H, dh, Tb] operand."""
    return 0 if k_mem is None else k_mem.shape[1] * k_mem.shape[4]


def heads_per_program(heads: int, role: str = "fwd") -> int:
    """Largest of {10, 5, 2} dividing the head count: grouping heads in one
    program lets the scheduler overlap head A's softmax (VPU) with head B's
    score matmuls (MXU); a single head is a strict MXU->VPU->MXU dependency
    chain (measured: hp=2 +2%, hp=5 +4.5% step throughput over hp=1; all 10
    heads in one program +1% over hp=5 once the 40 MB vmem cap made it fit
    — the 16 MB default rejected it).  ``COMMU_FWD_HP`` / ``COMMU_BWD_HP``
    override per direction (perf experiments, or to fit a larger model's
    working set)."""
    import os
    env = os.environ.get(f"COMMU_{role.upper()}_HP")
    if env:
        hp = int(env)
        if heads % hp != 0:
            # hard error (not assert): under python -O a silently-accepted
            # non-dividing hp would make the heads//hp grid skip trailing
            # heads — wrong outputs, not a crash
            raise ValueError(
                f"COMMU_{role.upper()}_HP={hp} must divide the head count "
                f"{heads} (the grid covers heads // hp groups)")
        return hp
    for hp in (10, 5, 2):
        if heads % hp == 0:
            return hp
    return 1


def _fused_call(kernel_fn, outs, q, rwbs, rrbs, k_mem, k_win, v_mem, v_win,
                w_r, trig_a, psi, mask, scalars, extra=(), hp=None, rp=1):
    batch, heads, dh, t = q.shape
    # k_mem/v_mem are BLOCKED [B, R, H, dh, Tb] (ring slabs; M = R*Tb)
    m_cap = _mem_cap(k_mem)
    if hp is None:
        hp = heads_per_program(heads)
    bh_t = pl.BlockSpec((rp, hp, dh, t), lambda b, h, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    if k_mem is not None:
        r_blocks, t_blk = k_mem.shape[1], k_mem.shape[4]
        bh_m = pl.BlockSpec((rp, r_blocks, hp, dh, t_blk),
                            lambda b, h, s: (b, 0, h, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        bh_m = None
    fdim = w_r.shape[2]
    bh_f = pl.BlockSpec((1, hp, dh, fdim), lambda b, h, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    # "fw": the widened dwr block carrying the r_w_bias / r_r_bias gradient
    # columns at [.., fdim] and [.., fdim+1]
    bh_fw = pl.BlockSpec((1, hp, dh, fdim + 128), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)

    def resident(shape):
        # whole-table block with a CONSTANT index: fetched once, then kept in
        # VMEM for the entire grid (~2.4 MB total at the training shape)
        n = len(shape)
        return pl.BlockSpec(shape, lambda b, h, s: (0,) * n,
                            memory_space=pltpu.VMEM)

    has_mem = k_mem is not None
    kv_specs = [bh_m, bh_t, bh_m, bh_t] if has_mem else [bh_t, bh_t]
    # "e" blocks are [T, K] score-shaped (the checkpointed normalized probs)
    e_blk = pl.BlockSpec((rp, hp, t, m_cap + t), lambda b, h, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    def extra_spec(kind, arr):
        if kind == "r":  # whole-array resident extra (e.g. the int8 psi)
            return resident(arr.shape)
        return {"t": bh_t, "e": e_blk}[kind]

    in_specs = [bh_t, resident(rwbs.shape), resident(rrbs.shape)] + \
        kv_specs + \
        [resident(w_r.shape), resident(trig_a.shape), resident(psi.shape),
         resident(mask.shape)] + \
        [extra_spec(kind, arr) for kind, arr in extra]
    out_specs = []
    out_shape = []
    for kind, dtype in outs:
        if kind == "e":
            out_specs.append(e_blk)
            out_shape.append(jax.ShapeDtypeStruct(
                (batch, heads, t, m_cap + t), dtype))
            continue
        n = {"t": t, "f": fdim, "fw": fdim + 128}[kind]
        spec = {"t": bh_t, "f": bh_f, "fw": bh_fw}[kind]
        out_specs.append(spec)
        out_shape.append(jax.ShapeDtypeStruct((batch, heads, dh, n), dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch // rp, heads // hp),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
    )
    operands = [q, rwbs, rrbs] + \
        ([k_mem, k_win, v_mem, v_win] if has_mem else [k_win, v_win]) + \
        [w_r, trig_a, psi, mask]
    return pl.pallas_call(
        kernel_fn, grid_spec=grid_spec,
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(scalars, *operands, *[arr for _, arr in extra])


def _fwd_rp(batch: int) -> int:
    """Batch rows per forward program (COMMU_FWD_RP, default 2).

    Rows are fully independent (separate q/k/v/o/e blocks), so running two
    per program hands the scheduler cross-row MXU work to hide each row's
    VPU softmax phase under — the same trick the fused-FFN kernels use
    (COMMU_FFN_RP).  Costs ~2x the per-program VMEM working set (still
    well inside the 40 MB cap at the reference shape); measured ~1.5
    ms/step at the training shape (94.9 vs 96.4 same-session probe, round
    3), while rp=4 regressed (99.4, needs an 80 MB cap).  The backward
    stays at one row per program: it is already at its MXU tile floor, and
    its resident dW accumulators leave less VMEM headroom."""
    import os
    rp = int(os.environ.get("COMMU_FWD_RP", "2"))
    while rp > 1 and batch % rp:
        rp -= 1
    return max(rp, 1)


def _bwd_rp(batch: int) -> int:
    """Batch rows per backward program in the memory-fused backward
    (COMMU_BWD_RP, default 2).

    Same cross-row MXU/VPU interleave rationale as ``_fwd_rp``; the
    backward's per-program working set is ~2x the forward's (checkpoint +
    do + the dW slab matmuls' operands), so rp=2 roughly doubles a ~16 MB
    set and needs the raised VMEM cap (``_vmem_limit``).  Round-4 probes at
    the training shape: rp=2 @ 100 MB is ~1 ms/step faster than rp=1 @
    40 MB (94.1 vs 95.2 median); rp=4 regresses (97.5).  The per-head-group
    dW accumulator blocks do NOT scale with rp (they are grid-resident),
    and any rp produces bit-equal dW gradients (global-batch-order f32
    accumulation, see _bwd_kernel_mem)."""
    import os
    rp = int(os.environ.get("COMMU_BWD_RP", "2"))
    while rp > 1 and batch % rp:
        rp -= 1
    return max(rp, 1)


def _fused_fwd(q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, w_r, trig_a, psi,
               mask, scalars, dropout_p, train, scale, save_e=False):
    t = q.shape[3]
    m_cap = _mem_cap(k_mem)
    rp = _fwd_rp(q.shape[0])
    kernel = _mem_kernel(functools.partial(
        _fwd_kernel, t=t, k_len=m_cap + t, dropout_p=dropout_p, train=train,
        hp=heads_per_program(q.shape[1]), scale=scale, rp=rp),
        k_mem is not None)
    # int8 BD (opt-in): the quantized psi rides as a forward-only resident
    # extra; the VJP residuals keep the bf16 psi for the backward
    extra = (("r", quantize_psi_int8(psi)),) if _bd_int8() else ()
    outs = [("t", q.dtype)] + ([("e", q.dtype)] if save_e else [])
    out = _fused_call(kernel, outs, q, rwbs, rrbs, k_mem, k_win,
                      v_mem, v_win, w_r, trig_a, psi, mask, scalars,
                      extra=extra, rp=rp)
    if not save_e:
        return out, None
    out, e = out
    return out, (q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, w_r, trig_a,
                 psi, mask, scalars, e)


def _fused_core_fwd(q, r_w_bias, r_r_bias, k_win, v_win, w_r, trig_a, psi,
                    mask, scalars, dropout_p, train, scale):
    rwbs, rrbs = _scaled_biases(r_w_bias, r_r_bias, scale, q.dtype)
    out, res = _fused_fwd(q, rwbs, rrbs, None, k_win, None, v_win, w_r,
                          trig_a, psi, mask, scalars, dropout_p, train,
                          scale, save_e=True)
    return out, (res, r_w_bias, r_r_bias)


def _split_dwr(dwr_wide, fdim, rwb, rrb):
    """Unpack the widened dwr block: [.., :fdim] = dW_r, column fdim =
    d r_w_bias, column fdim+1 = d r_r_bias (already scale-folded)."""
    dwr = dwr_wide[..., :fdim]
    drwb = dwr_wide[..., fdim].astype(rwb.dtype)
    drrb = dwr_wide[..., fdim + 1].astype(rrb.dtype)
    return dwr, drwb, drrb


def _fused_bwd(dropout_p, train, scale, residuals, g):
    (q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, w_r, trig_a, psi, mask,
     scalars, e), rwb, rrb = residuals
    assert k_mem is None, "memory attention differentiates via fused_core_mem"
    t = q.shape[3]
    dtype = q.dtype
    fdim = w_r.shape[2]
    bwd_hp = heads_per_program(q.shape[1], "bwd")
    kernel = _bwd_mem_kernel(functools.partial(
        _bwd_kernel, t=t, k_len=t, dropout_p=dropout_p, train=train,
        hp=bwd_hp, scale=scale), False)
    extra = (("t", g.astype(dtype)), ("e", e))
    if _bd_int8_bwd():
        extra += (("r", quantize_psi_int8(psi)),)
    dq, dkw, dvw, dwr_bh = _fused_call(
        kernel,
        [("t", dtype), ("t", dtype), ("t", dtype), ("fw", jnp.float32)],
        q, rwbs, rrbs, None, k_win, None, v_win, w_r, trig_a, psi, mask,
        scalars, extra=extra, hp=bwd_hp)
    dwr_wide = dwr_bh.sum(axis=0, dtype=jnp.float32)
    dwr, drwb, drrb = _split_dwr(dwr_wide, fdim, rwb, rrb)
    # trig_a/psi/mask are pure functions of step counters (no parameters
    # upstream): symbolic-zero cotangents, DCE'd by XLA
    return (dq, drwb, drrb, dkw, dvw, dwr.astype(w_r.dtype),
            jnp.zeros_like(trig_a), jnp.zeros_like(psi),
            jnp.zeros_like(mask), None)


fused_core.defvjp(_fused_core_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Memory-projection-fused variant: dW IN-KERNEL, no memory-half cotangents
# ---------------------------------------------------------------------------

def _bwd_kernel_mem(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref, kw_ref,
                    vm_ref, vw_ref, mem_ref, wr_ref, trig_ref, psi_ref,
                    mask_ref, do_ref, e_ref, *rest,
                    t, k_len, dropout_p, train, hp, scale, rp=1):
    """Backward with the memory-half weight gradients accumulated IN-KERNEL.

    Grid is (H/hp, B/rp) — batch INNERMOST — so the dWk/dWv/dWr accumulator
    blocks (indexed by the head group alone) stay VMEM-resident across all
    batch steps and are flushed once per head group.  The [B, H, dh, M]
    memory-half cotangents dkm/dvm are consumed on the spot by one dW matmul
    per head GROUP and ring slab against the raw memory block (heads batched
    so the MXU row dim is hp*dh=250, not 50) — they never exist in HBM (at
    the training shape that removes ~3.1 GB of kernel writes plus the
    relayout copies and separate dW contractions XLA needed).  With
    COMMU_BWD_RP > 1 the program covers ``rp`` batch rows (see
    ``_bwd_pipeline``); the dW slab matmuls then accumulate over the rows'
    memory blocks too."""
    # rest = ([psiq (int8 dphi operand, _bd_int8_bwd),]
    #         dq_ref, dkw_ref, dvw_ref, dwk_ref, dwv_ref, dwr_ref)
    psiq_ref = None
    if _bd_int8_bwd():
        psiq_ref, rest = rest[0], rest[1:]
    dq_ref, dkw_ref, dvw_ref, dwk_ref, dwv_ref, dwr_ref = rest
    hg, b0 = pl.program_id(0), pl.program_id(1)
    m_cap = k_len - t
    first = b0 == 0
    r_blocks = mem_ref.shape[1]                  # mem_ref [1, R, rp, D, Tb]
    t_blk = mem_ref.shape[4]
    dk_ms = [[] for _ in range(rp)]
    dv_ms = [[] for _ in range(rp)]
    dwrs = []

    def stage_a(h, hh, rr):
        return _bwd_stage_a(scalar_ref, q_ref, rwbs_ref, rrbs_ref, km_ref,
                            kw_ref, vm_ref, vw_ref, do_ref, e_ref,
                            b0 * rp + rr, h, hh,
                            t=t, k_len=k_len, dropout_p=dropout_p,
                            train=train, scale=scale, rr=rr)

    def finish(rr, hh, h, a):
        dq, dk, dv, dwr_wide = _bwd_stage_b(
            wr_ref, trig_ref, psi_ref, a, h, dropout_p=dropout_p,
            scale=scale, psiq_ref=psiq_ref)
        dq_ref[rr, hh, :, :] = dq.astype(dq_ref.dtype)
        dkw_ref[rr, hh, :, :] = dk[:, m_cap:].astype(dkw_ref.dtype)
        dvw_ref[rr, hh, :, :] = dv[:, m_cap:].astype(dvw_ref.dtype)
        dk_ms[rr].append(dk[:, :m_cap].astype(mem_ref.dtype))    # [dh, M]
        dv_ms[rr].append(dv[:, :m_cap].astype(mem_ref.dtype))
        dwrs.append(dwr_wide)

    _bwd_pipeline(hp, hg, stage_a, finish, rp=rp)
    # dW_k[group] += dk_mem @ mem^T over all hp heads at once, one matmul
    # per ring slab and local row (no [D, M] concat of the memory in VMEM),
    # accumulated f32 across the batch grid (the standalone XLA contraction
    # rounds dkm to bf16 first; here the per-batch-row dW partial
    # accumulates in f32).  NOTE finish() appends heads-outer/rows-inner,
    # but dk_ms/dv_ms are indexed by row, so each per-row list is
    # head-ordered regardless of the pipeline interleave.  Per-row partials
    # fold into the grid-resident accumulators in GLOBAL batch order, so the
    # f32 add sequence is IDENTICAL to rp=1's per-program accumulation — any
    # COMMU_BWD_RP produces bit-equal dWk/dWv/dWr.
    dh, d_model = dwr_ref.shape[1], mem_ref.shape[3]
    dwk_rows, dwv_rows, dwr_rows = [], [], []
    for rr in range(rp):
        dk_g = jnp.concatenate(dk_ms[rr], axis=0)                # [hp*dh, M]
        dv_g = jnp.concatenate(dv_ms[rr], axis=0)
        dwk = dwv = None
        for r in range(r_blocks):
            mem_r = mem_ref[0, r, rr]                            # [D, Tb]
            sl = slice(r * t_blk, (r + 1) * t_blk)
            dwk_r = jax.lax.dot_general(dk_g[:, sl], mem_r,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            dwv_r = jax.lax.dot_general(dv_g[:, sl], mem_r,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            dwk = dwk_r if dwk is None else dwk + dwk_r
            dwv = dwv_r if dwv is None else dwv + dwv_r
        dwk_rows.append(dwk.reshape(hp, dh, d_model))
        dwv_rows.append(dwv.reshape(hp, dh, d_model))
        # dwrs index is hh*rp + rr: [rr::rp] is this row in head order
        dwr_rows.append(jnp.stack(dwrs[rr::rp], axis=0))     # [hp,dh,512+128]

    def fold(ref, rows, fresh):
        acc = rows[0] if fresh else ref[...] + rows[0]
        for row in rows[1:]:
            acc = acc + row
        ref[...] = acc

    @pl.when(first)
    def _():
        fold(dwk_ref, dwk_rows, True)
        fold(dwv_ref, dwv_rows, True)
        fold(dwr_ref, dwr_rows, True)

    @pl.when(jnp.logical_not(first))
    def _():
        fold(dwk_ref, dwk_rows, False)
        fold(dwv_ref, dwv_rows, False)
        fold(dwr_ref, dwr_rows, False)


def _bwd_call_mem(kernel_fn, q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, mem,
                  w_r, trig_a, psi, mask, scalars, do, e, layer_idx, rp=1,
                  psiq=None):
    """pallas_call for the memory-fused backward: grid (H/hp, B/rp).

    ``mem`` is the FULL blocked ring buffer [L+1, R, B, D, Tb]; the
    BlockSpec indexes layer ``layer_idx`` directly so no per-layer slice is
    ever materialized in HBM (a pallas operand cannot fuse a slice; the
    block DMA can)."""
    batch, heads, dh, t = q.shape
    r_blocks, t_blk = k_mem.shape[1], k_mem.shape[4]
    m_cap = r_blocks * t_blk
    d_model = mem.shape[3]
    hp = heads_per_program(heads, "bwd")
    fdim = w_r.shape[2]
    dtype = q.dtype

    bh_t = pl.BlockSpec((rp, hp, dh, t), lambda h, b, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bh_m = pl.BlockSpec((rp, r_blocks, hp, dh, t_blk),
                        lambda h, b, s: (b, 0, h, 0, 0),
                        memory_space=pltpu.VMEM)
    mem_spec = pl.BlockSpec(
        (1, r_blocks, rp, d_model, t_blk),
        lambda h, b, s: (layer_idx, 0, b, 0, 0), memory_space=pltpu.VMEM)
    e_blk = pl.BlockSpec((rp, hp, t, m_cap + t), lambda h, b, s: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)

    def resident(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda h, b, s: (0,) * n,
                            memory_space=pltpu.VMEM)

    def acc(n):  # per-head-group f32 accumulator, resident across batch
        return pl.BlockSpec((hp, dh, n), lambda h, b, s: (h, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [bh_t, resident(rwbs.shape), resident(rrbs.shape),
                bh_m, bh_t, bh_m, bh_t, mem_spec,
                resident(w_r.shape), resident(trig_a.shape),
                resident(psi.shape), resident(mask.shape), bh_t, e_blk] + \
        ([resident(psiq.shape)] if psiq is not None else [])
    out_specs = [bh_t, bh_t, bh_t, acc(d_model), acc(d_model),
                 acc(fdim + 128)]
    out_shape = [
        jax.ShapeDtypeStruct((batch, heads, dh, t), dtype),   # dq (fused)
        jax.ShapeDtypeStruct((batch, heads, dh, t), dtype),   # dkw
        jax.ShapeDtypeStruct((batch, heads, dh, t), dtype),   # dvw
        jax.ShapeDtypeStruct((heads, dh, d_model), jnp.float32),  # dWk
        jax.ShapeDtypeStruct((heads, dh, d_model), jnp.float32),  # dWv
        # dWr + the two bias-gradient columns (widened block)
        jax.ShapeDtypeStruct((heads, dh, fdim + 128), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(heads // hp, batch // rp),
        in_specs=in_specs, out_specs=out_specs)
    return pl.pallas_call(
        kernel_fn, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(scalars, q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, mem, w_r, trig_a,
      psi, mask, do, e, *(() if psiq is None else (psiq,)))


def _proj_pipe() -> int:
    """Slabs in flight ahead of the store phase in the projection kernel
    (COMMU_PROJ_PIPE).  The store is not free: the [H*dh, Tb] matmul value
    splits its sublanes at dh=50 boundaries (mid-vreg) and casts to bf16 —
    emitting the next slab's matmuls first gives the scheduler MXU work to
    hide that relayout under (same trick as the attention head loops)."""
    import os
    return int(os.environ.get("COMMU_PROJ_PIPE", "1"))


def _proj_mem_kernel(mem_ref, wk_ref, wv_ref, k_ref, v_ref, *, heads, rp):
    """Per batch-row group: project all R ring slabs of one layer through
    the k and v weights — ONE read of the memory serves both projections."""
    r_blocks = mem_ref.shape[1]

    def finish(row, r, k, v):
        hdh, t_blk = k.shape
        k_ref[row, r] = k.reshape(heads, hdh // heads,
                                  t_blk).astype(k_ref.dtype)
        v_ref[row, r] = v.reshape(heads, hdh // heads,
                                  t_blk).astype(v_ref.dtype)

    depth = _proj_pipe()
    pend = []
    for row in range(rp):
        for r in range(r_blocks):
            m = mem_ref[0, r, row]                               # [D, Tb]
            k = jax.lax.dot_general(wk_ref[...], m, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = jax.lax.dot_general(wv_ref[...], m, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            pend.append((row, r, k, v))
            if len(pend) > depth:
                finish(*pend.pop(0))
    for st in pend:
        finish(*st)


def _proj_rp(batch: int) -> int:
    """Batch rows per projection program (COMMU_PROJ_RP)."""
    import os
    rp = int(os.environ.get("COMMU_PROJ_RP", "2"))
    while rp > 1 and batch % rp != 0:
        rp -= 1
    return rp


def project_mem_kv(mem, layer_idx, wk3, wv3):
    """Blocked memory k/v projection: mem [L+1, R, B, D, Tb] x wk3/wv3
    [D, H, dh] -> (k, v) [B, R, H, dh, Tb].

    A Pallas kernel that block-indexes ``layer_idx`` directly — the XLA
    einsum route materializes every interior layer slice (~4 ms/step of pure
    copies at the training shape) and runs the projection convolutions well
    off peak; here the layer slice is a block DMA, the memory is read ONCE
    for both k and v, and the matmuls run at native MXU shape.  (Projecting
    INSIDE the attention kernels instead was tried and reverted: the HBM
    round trips this kernel's outputs cost are fully overlapped, so the
    duplicated fwd+bwd projection FLOPs regressed the step 98 -> 115 ms.)"""
    l1, r_blocks, batch, d_model, t_blk = mem.shape
    heads, dh = wk3.shape[1], wk3.shape[2]
    wk = wk3.reshape(d_model, heads * dh).astype(mem.dtype)
    wv = wv3.reshape(d_model, heads * dh).astype(mem.dtype)
    rp = _proj_rp(batch)
    # per-program working set scales with rp (block + double-buffered k/v
    # outputs); give the projection kernel headroom beyond the shared cap so
    # COMMU_PROJ_RP=4/8 are probe-able (v5e has 128 MB of physical VMEM)
    vmem_limit = max(_vmem_limit(), (rp * 13 + 14) * 1024 * 1024)

    mem_spec = pl.BlockSpec((1, r_blocks, rp, d_model, t_blk),
                            lambda b: (layer_idx, 0, b, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d_model, heads * dh), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rp, r_blocks, heads, dh, t_blk),
                            lambda b: (b, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((batch, r_blocks, heads, dh, t_blk),
                                     mem.dtype)
    return pl.pallas_call(
        functools.partial(_proj_mem_kernel, heads=heads, rp=rp),
        grid=(batch // rp,),
        in_specs=[mem_spec, w_spec, w_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=_interpret(),
    )(mem, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def fused_core_mem(q, r_w_bias, r_r_bias, mem, wk3, wv3, k_win, v_win, w_r,
                   trig_a, psi, mask, scalars,
                   dropout_p, train, layer_idx, scale):
    """fused_core with the memory-half k/v projections INSIDE the VJP
    boundary: mem is the FULL blocked D-major ring buffer [L+1, R, B, D, Tb]
    (the kernel block-indexes layer ``layer_idx`` so no per-layer slice
    materializes),
    wk3/wv3 [D, H, dh] slices of the kv projection.  The content/position
    bias fold (qw/qr) happens inside too — see ``fused_core``.

    The XL memory is stop-gradient by construction (the reference detaches
    stored hiddens, model.py:507-538; the train step stores
    ``stop_gradient`` rows), so the memory cotangent is zero and the ONLY
    consumers of dkm/dvm are the weight gradients — which the backward
    kernel accumulates in-kernel (``_bwd_kernel_mem``).  The returned mem
    cotangent is symbolic-zero (DCE'd: nothing differentiates w.r.t. the
    carried memory buffer)."""
    rwbs, rrbs = _scaled_biases(r_w_bias, r_r_bias, scale, q.dtype)
    if proj_in_fwd():
        out, _, _ = _fused_fwd_proj(
            q, rwbs, rrbs, mem, layer_idx, wk3, wv3, k_win, v_win, w_r,
            trig_a, psi, mask, scalars, dropout_p, train, scale,
            save_e=False)
        return out
    k_mem, v_mem = project_mem_kv(mem, layer_idx, wk3, wv3)
    out, _ = _fused_fwd(q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, w_r,
                        trig_a, psi, mask, scalars, dropout_p, train, scale,
                        save_e=False)
    return out


def _fused_fwd_mem(q, r_w_bias, r_r_bias, mem, wk3, wv3, k_win, v_win, w_r,
                   trig_a, psi, mask, scalars,
                   dropout_p, train, layer_idx, scale):
    rwbs, rrbs = _scaled_biases(r_w_bias, r_r_bias, scale, q.dtype)
    if proj_in_fwd():
        out, k_mem, v_mem, e = _fused_fwd_proj(
            q, rwbs, rrbs, mem, layer_idx, wk3, wv3, k_win, v_win, w_r,
            trig_a, psi, mask, scalars, dropout_p, train, scale, save_e=True)
    else:
        k_mem, v_mem = project_mem_kv(mem, layer_idx, wk3, wv3)
        out, res = _fused_fwd(q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, w_r,
                              trig_a, psi, mask, scalars, dropout_p, train,
                              scale, save_e=True)
        e = res[-1]
    return out, (q, rwbs, rrbs, r_w_bias, r_r_bias, mem, wk3, wv3, k_mem,
                 k_win, v_mem, v_win, w_r, trig_a, psi, mask, scalars, e)


def _fused_bwd_mem(dropout_p, train, layer_idx, scale, residuals, g):
    (q, rwbs, rrbs, rwb, rrb, mem, wk3, wv3, k_mem, k_win, v_mem, v_win,
     w_r, trig_a, psi, mask, scalars, e) = residuals
    t = q.shape[3]
    m_cap = _mem_cap(k_mem)
    dtype = q.dtype
    fdim = w_r.shape[2]
    rp = _bwd_rp(q.shape[0])
    kernel = functools.partial(
        _bwd_kernel_mem, t=t, k_len=m_cap + t, dropout_p=dropout_p,
        train=train, hp=heads_per_program(q.shape[1], "bwd"), scale=scale,
        rp=rp)
    dq, dkw, dvw, dwk, dwv, dwr_wide = _bwd_call_mem(
        kernel, q, rwbs, rrbs, k_mem, k_win, v_mem, v_win, mem, w_r, trig_a,
        psi, mask, scalars, g.astype(dtype), e, layer_idx, rp=rp,
        psiq=quantize_psi_int8(psi) if _bd_int8_bwd() else None)
    # kernel emits [H, dh, D] f32; the projection slice wants [D, H, dh]
    dwk3 = jnp.transpose(dwk, (2, 0, 1)).astype(wk3.dtype)
    dwv3 = jnp.transpose(dwv, (2, 0, 1)).astype(wv3.dtype)
    dwr, drwb, drrb = _split_dwr(dwr_wide, fdim, rwb, rrb)
    return (dq, drwb, drrb, jnp.zeros_like(mem), dwk3, dwv3, dkw, dvw,
            dwr.astype(w_r.dtype), jnp.zeros_like(trig_a),
            jnp.zeros_like(psi), jnp.zeros_like(mask), None)


fused_core_mem.defvjp(_fused_fwd_mem, _fused_bwd_mem)


def attention(q, k_win, v_win, w_r, psi, r_w_bias, r_r_bias,
              reset: Optional[jnp.ndarray], *, d_model,
              scale, same_length, dropout_p=0.0, dropout_seed=0, train=False):
    """Kernel-layout entry point for the NO-memory case (fresh sequence /
    zero-capacity memory; nonempty memories go through ``attention_mem``).

    q, k_win, v_win: [B, H, dh, T]; w_r: [H, dh, 512] (``pack_r_kernel`` of
    the position projection); psi: [512, T] key trig basis
    (``key_trig_basis``), possibly with positional dropout applied.
    Returns [B, H, dh, T].
    """
    t = q.shape[3]
    trig_a = query_trig_table(t, 0, d_model, dtype=q.dtype)
    mask = build_mask_bias(t, 0, jnp.zeros((), jnp.int32),
                           jnp.zeros((), jnp.int32), same_length)
    scalars = _scalars(dropout_seed, reset, q.shape[0])
    return fused_core(q, r_w_bias, r_r_bias, k_win, v_win, w_r,
                      trig_a, psi.astype(q.dtype), mask, scalars,
                      dropout_p, train, float(scale))


def attention_mem(q, mem, layer_idx, wk3, wv3, k_win, v_win, w_r, psi,
                  r_w_bias, r_r_bias, mem_count, mem_head,
                  reset: Optional[jnp.ndarray],
                  *, d_model, scale, same_length, dropout_p=0.0,
                  dropout_seed=0, train=False):
    """Like ``attention`` but takes the RAW blocked D-major ring buffer
    [L+1, R, B, D, Tb] plus the layer index and the k/v projection slices
    wk3/wv3 [D, H, dh], and projects the memory half inside the custom-VJP
    boundary (``fused_core_mem``) — the backward then accumulates
    dWk/dWv/dWr in-kernel and never materializes the [B,H,dh,M] memory-half
    cotangents.  Requires a nonempty memory."""
    t = q.shape[3]
    m_cap = mem.shape[1] * mem.shape[4]
    trig_a = query_trig_table(t, m_cap, d_model, dtype=q.dtype)
    mask = build_mask_bias(t, m_cap, mem_count, mem_head, same_length)
    scalars = _scalars(dropout_seed, reset, q.shape[0])
    return fused_core_mem(q, r_w_bias, r_r_bias, mem, wk3, wv3, k_win, v_win,
                          w_r, trig_a, psi.astype(q.dtype), mask, scalars,
                          dropout_p, train, layer_idx, float(scale))
