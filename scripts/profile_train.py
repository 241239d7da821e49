"""Capture a jax.profiler trace of the train step and print an op-level
time breakdown.

Usage: python scripts/profile_train.py [--steps 5] [--out /tmp/prof]
       python scripts/profile_train.py --parse /tmp/prof   # re-parse only

Parses the xplane.pb with the TSL protobuf (the tensorboard-plugin converter
is broken against the installed TF); aggregates the "XLA Ops" line's event
durations by op name, grouped by a coarse category.
"""
import argparse
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, n_steps: int):
    from commu_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.models.transformer_xl import TransformerXL
    from commu_tpu.parallel import make_mesh, shard_train_step
    from commu_tpu.training.step import (create_train_state,
                                         init_train_memory, make_train_step,
                                         resolve_physical_chunks)
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    cfg = get_default_cfg_training()
    tcfg = cfg.train
    batch, tgt = tcfg.batch_size, tcfg.tgt_length
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg)
    physical = resolve_physical_chunks(cfg)
    from commu_tpu.models.transformer_xl import resolve_attn_impl
    transposed = resolve_attn_impl(cfg.model) == "pallas"
    step = shard_train_step(
        make_train_step(model, cfg, physical_chunks=physical), make_mesh(1),
        transposed=transposed)
    memory = init_train_memory(
        cfg.model.num_layers, batch, tcfg.mem_length, cfg.model.units,
        physical, dtype=jnp.bfloat16, transposed=transposed,
        block_len=tgt)
    rng = np.random.RandomState(0)
    data = rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32)
    target = rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32)
    reset = np.zeros(batch, dtype=bool)
    key = jax.random.PRNGKey(1)

    for _ in range(3):
        state, memory, metrics = step(state, memory, data, target, reset, key)
    float(metrics["nll_sum"])

    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            state, memory, metrics = step(state, memory, data, target, reset,
                                          key)
        float(metrics["nll_sum"])


CATEGORIES = [
    ("attn_kernel", re.compile(r"custom-call|tpu_custom_call|pallas|fused_rel_attn")),
    ("matmul", re.compile(r"dot|einsum|conv")),
    ("copy", re.compile(r"copy|transpose|reshape|bitcast")),
    ("convert", re.compile(r"convert")),
    ("dynamic", re.compile(r"dynamic-slice|dynamic-update|gather|scatter")),
    ("reduce", re.compile(r"reduce|all-reduce")),
]


def parse(out_dir: str, n_steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xspace.ParseFromString(fh.read())

    by_op = collections.Counter()
    total_ps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            # events nest (while/fusion bodies); count SELF time only:
            # sweep by start, subtract each event's duration from the
            # enclosing event on a stack
            evs = sorted(((ev.offset_ps, ev.duration_ps,
                           ev_names.get(ev.metadata_id, "?"))
                          for ev in line.events), key=lambda t: (t[0], -t[1]))
            stack = []  # (end_ps, name, child_ps, whole_ps)
            for off, dur, name in evs:
                while stack and stack[-1][0] <= off:
                    end, nm, child, whole = stack.pop()
                    self_ps = whole - child
                    by_op[nm] += self_ps
                    total_ps += self_ps
                    if stack:
                        stack[-1] = (stack[-1][0], stack[-1][1],
                                     stack[-1][2] + whole, stack[-1][3])
                stack.append((off + dur, name, 0, dur))
            while stack:
                end, nm, child, whole = stack.pop()
                self_ps = whole - child
                by_op[nm] += self_ps
                total_ps += self_ps
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1],
                                 stack[-1][2] + whole, stack[-1][3])

    def categorize(name):
        low = name.lower()
        for cat, pat in CATEGORIES:
            if pat.search(low):
                return cat
        return "other"

    by_cat = collections.Counter()
    for name, ps in by_op.items():
        by_cat[categorize(name)] += ps

    ms = 1e-9
    per_step = total_ps / n_steps * ms
    print(f"device op time: {total_ps * ms:.1f} ms total, "
          f"{per_step:.1f} ms/step over {n_steps} steps\n")
    print("by category (ms/step):")
    for cat, ps in by_cat.most_common():
        print(f"  {cat:12s} {ps / n_steps * ms:8.2f}")
    top = int(os.environ.get("PROFILE_TOP", "25"))
    print(f"\ntop {top} ops (ms/step):")
    for name, ps in by_op.most_common(top):
        print(f"  {ps / n_steps * ms:8.3f}  {name[:130]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/prof_train")
    ap.add_argument("--parse", metavar="DIR",
                    help="skip capture, parse an existing trace dir")
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.steps)
    else:
        capture(args.out, args.steps)
        parse(args.out, args.steps)


if __name__ == "__main__":
    main()
