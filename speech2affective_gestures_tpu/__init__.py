"""speech2affective_gestures_tpu — TPU-native (JAX/XLA/Pallas) rebuild of
UttaranB127/speech2affective_gestures (ACM MM '21).

A standalone framework for co-speech gesture synthesis with generative
adversarial affective expression learning, designed TPU-first:

- compute path: JAX / XLA / Pallas kernels, static shapes, `lax.scan`
  recurrences, MXU-shaped matmuls;
- parallelism: a single `jax.sharding.Mesh` with a `data` axis (pjit),
  subsuming the reference's `nn.DataParallel` (processor_v2.py:167-172);
- data path: packed fixed-shape arrays on device, no per-batch H2D chatter;
- checkpointing: orbax + a converter for the reference `.pth.tar` format.

Layer map (mirrors SURVEY.md §1):
  ops/       pose FK, graph adjacency, DSP (mel/MFCC), quaternions
  models/    encoders, ST-GCN, TCN, generators, discriminators, eval nets
  data/      vocab, TED-db pipeline, windowing, motion filtering
  train/     losses, GAN train step, trainer loop, FGD evaluator
  parallel/  mesh construction + sharding entry points
  render/    stick-figure video, BVH export
  convert/   torch .pth.tar -> JAX pytree
"""

__version__ = "0.1.0"
