"""ComMU-TPU: a TPU-native (JAX/XLA/Pallas) framework for combinatorial music generation.

A ground-up rebuild of the capabilities of POZAlabs/ComMU-code (reference mounted at
/root/reference) designed for TPU hardware:

- ``commu_tpu.vocab``      — the 729-token REMI event space + metadata codec
  (bit-for-bit compatible with the reference token ids; this is the data contract).
- ``commu_tpu.midi``       — standalone Standard MIDI File I/O (no external MIDI deps).
- ``commu_tpu.preprocess`` — MIDI parse → key/BPM augmentation → tokenization → npy.
- ``commu_tpu.models``     — Transformer-XL LM in Flax with segment-level memory.
- ``commu_tpu.ops``        — XLA/Pallas kernels: relative attention, rel-shift, sampling.
- ``commu_tpu.data``       — XL-style continuation-packing data pipeline.
- ``commu_tpu.parallel``   — mesh construction + sharding rules (data-parallel over ICI).
- ``commu_tpu.training``   — jit train/eval steps, LR schedule, orbax checkpoints.
- ``commu_tpu.generation`` — metadata-conditioned, chord-constrained sampling with a
  jit KV-cache decode loop.
"""

__version__ = "0.1.0"
