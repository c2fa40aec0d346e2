"""stjep_tpu — TPU-native speech translation via joint embedding passing.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch codebase (EdieLu/speech-translation-joint-embedding-passing):

- LAS-style pyramidal BiLSTM ASR producing per-token *dynamic* acoustic
  embeddings (ref: models/Enc.py, models/Dec.py)
- Transformer MT consuming [static word emb; dynamic emb] via a projection
  bridge (ref: models/Seq2seq.py:183-199)
- Four training modes (ASR / MT / ST / ASR_ST), staged pretrain->finetune
  load/freeze policies, checkpoint averaging, on-device greedy + beam decode.

Design: pure pytree params + pure apply functions, one pjit-compiled step per
mode, lax.scan for recurrences, lax.while_loop + KV cache for decode, Pallas
kernels for the LSTM hot path, and a (data, model) device mesh for scaling.
"""

__version__ = "0.1.0"

from stjep_tpu.config import PAD, UNK, BOS, EOS, SPC  # noqa: F401
