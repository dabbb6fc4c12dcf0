"""icl — TPU-native rebuild of the ImageCaptionLearn_py neural stack.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
repo ``cmcervantes/ImageCaptionLearn_py`` (Theano/Keras-1 era research code for
entity analysis over Flickr30k Entities captions).

NOTE on reference citations: the reference checkout at /root/reference was
EMPTY when this framework was designed (verified 2026-08-16; see SURVEY.md §0).
All "reference:" notes in docstrings therefore cite the frozen contracts in
SURVEY.md (§6) and BASELINE.json rather than reference file:line.

Layer map (SURVEY.md §2.2):
  L0 icl.ops       — Pallas/Mosaic kernels (pair construction K1, affinity K2)
  L1 (jax/XLA)     — jit-compiled programs on TPU via PJRT
  L2 icl.dist      — Mesh / NamedSharding / multi-host bootstrap
  L3 icl.io+data   — .feats/.scores/captions/boxes IO, w2v table, buckets
  L4 icl.models    — flax modules: nonvisual FFNN, relation BiLSTM, affinity
  L5 icl.train/eval— optax train steps, orbax checkpoints, ScoreDict metrics
  L6 icl.cli       — task entry points mirroring the reference CLI surface
"""

__version__ = "0.1.0"
