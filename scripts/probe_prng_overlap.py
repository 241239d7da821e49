"""Microbench: can Mosaic hide in-kernel PRNG draws under MXU work?

The round-4 dropout tax is 4.9 ms/step at the reference rates
(probe_step.py COMMU_PROBE_DROPOUT), dominated by the attention forward's
per-(batch, head) ``prng_random_bits`` mask draws.  Whether that cost is
recoverable depends on how the Mosaic scheduler treats the stateful PRNG
ops relative to independent matmuls:

  A  matmuls only                       -> the MXU floor
  B  draws interleaved between matmuls  -> production-like emission order
  C  all draws before all matmuls       -> prologue pre-draw alternative
  D  draws only                         -> the VPU draw floor

If B ~= max(A, D) the scheduler overlaps draws with matmuls and the tax is
intrinsic VPU volume (only fewer/narrower draws can cut it).  If
B ~= A + D the draws serialize against the MXU (barrier-like), and
restructuring emission (e.g. C) or batching draws is worth pursuing.

Run on the chip:  python scripts/probe_prng_overlap.py [--iters 40]

Round-4 result (axon-tunneled v5e): B(1.84) < A(2.03) + 0.7*D(1.59) ->
draws OVERLAP matmuls (no barrier), though per-call dispatch latency
through the tunnel (~1.5 ms) dominates these small kernels — the last
interleaved round measured all four modes within 0.1 ms of each other, so
treat the conclusion as weak.  Consistent with the production finding that
the dropout tax is intrinsic VPU draw/select volume rather than lost
scheduling overlap.
"""
import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MM = 24          # matmul pairs per program (~BD-scale MXU work)
DRAWS = 20         # [128, 576] u32 draws per program (~20 pipeline units)
GRID = 128         # programs (~batch//rp at the training shape)


def build(mode: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, a_ref, b_ref, o_ref, *, mode):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        acc = jnp.zeros((128, 128), jnp.float32)
        bits_acc = jnp.zeros((128, 576), jnp.uint32)

        def draw():
            return pltpu.prng_random_bits((128, 576))

        def mm(i, acc):
            return acc + jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if mode == "C":
            for _ in range(DRAWS):
                bits_acc = bits_acc ^ draw()
        n_between = {"A": 0, "D": DRAWS}.get(mode)
        for i in range(N_MM):
            if mode != "D":
                acc = mm(i, acc)
            if mode == "B" and i < DRAWS:
                bits_acc = bits_acc ^ draw()
        if mode == "D":
            for _ in range(DRAWS):
                bits_acc = bits_acc ^ draw()
        # consume both so neither path is DCE'd
        bits_f = (bits_acc[:, :128] & jnp.uint32(1)).astype(
            jnp.int32).astype(jnp.float32)
        o_ref[0] = acc + bits_f * 1e-30

    a = jnp.ones((128, 512), jnp.bfloat16)
    b = jnp.ones((512, 128), jnp.bfloat16)
    seeds = jnp.arange(1, dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(GRID,),
        in_specs=[pl.BlockSpec(a.shape, lambda g, s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(b.shape, lambda g, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda g, s: (g, 0, 0),
                               memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRID, 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda: fn(seeds, a, b))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    import jax

    fns = {}
    for mode in "ABCD":
        fns[mode] = build(mode)
        jax.block_until_ready(fns[mode]())  # compile
    res = {m: [] for m in fns}
    for _ in range(args.rounds):
        for m, f in fns.items():  # interleaved rounds cancel drift
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f()
            jax.block_until_ready(out)
            res[m].append((time.perf_counter() - t0) / args.iters * 1e3)
    for m in "ABCD":
        print(f"[{m}] {statistics.median(res[m]):7.3f} ms  "
              f"(rounds: {', '.join(f'{t:.3f}' for t in res[m])})")
    a, b_, c, d = (statistics.median(res[m]) for m in "ABCD")
    print(f"\nA(mm)={a:.3f} D(draws)={d:.3f} A+D={a + d:.3f} "
          f"max(A,D)={max(a, d):.3f}")
    print(f"B(interleaved)={b_:.3f} C(prologue)={c:.3f} -> "
          f"{'draws OVERLAP matmuls' if b_ < a + 0.7 * d else 'draws SERIALIZE (barrier-like)'}")


if __name__ == "__main__":
    main()
