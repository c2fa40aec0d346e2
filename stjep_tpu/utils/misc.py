"""Host-side utilities: detokenisation, corpus accumulation, seeds, memory.

Rebuilds the reference's utils/misc.py surface that the trainers and CLIs
use. Device selection and GPU memory grabbing are unnecessary on TPU.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Sequence, Tuple

import numpy as np

from stjep_tpu.config import BOS_TOKEN, EOS_TOKEN, PAD_TOKEN, SPC_TOKEN

# re-export config helpers under their reference names
from stjep_tpu.config import read_config, save_config, validate_config  # noqa: F401


def set_global_seeds(i: int):
    """Seed host RNGs (ref: utils/misc.py:162-171). Device randomness uses
    explicit jax.random keys derived from this seed."""
    np.random.seed(i)
    random.seed(i)


def root_key(seed: int, impl: str = "auto"):
    """Root PRNG key for training randomness (dropout, SpecAugment).

    impl 'auto' picks the TPU hardware RNG ('rbg') on tpu/axon backends and
    threefry elsewhere: threefry mask generation is pure VPU ALU work and
    measurably taxes the train step (~3.5 ms of a ~39 ms flagship step in
    the TF decoder alone), while rbg uses the on-chip generator. rbg keys
    are deterministic per compiled program but not bit-stable across
    backends/XLA versions — fine for dropout, which the reference draws
    from torch's global RNG anyway. Splits preserve the impl, so one root
    key switches every downstream draw."""
    import jax

    if impl == "auto":
        impl = ("rbg" if jax.default_backend() in ("tpu", "axon")
                else "threefry2x32")
    return jax.random.key(seed, impl=impl)


def flash_kernels_disabled() -> bool:
    """Global kill-switch for the fused Pallas kernels (STJEP_NO_FLASH=1).

    A user escape hatch: every kernel gate honours it, falling back to the
    dense XLA paths (useful for debugging, and for strict-f32 arithmetic
    with jax_default_matmul_precision=highest — the LAS decode kernel holds
    weights in bf16 on real TPUs, see ops/las_flash.py). Meshes no longer
    need it: parallel/spmd.py dispatches the kernels through shard_map
    under any mesh shape."""
    import os

    return os.environ.get("STJEP_NO_FLASH") == "1"


def get_memory_alloc() -> Tuple[float, float, float]:
    """(kb, mb, gb) RSS of this process (ref: utils/misc.py:136-146)."""
    try:
        import psutil

        mem_byte = psutil.Process(os.getpid()).memory_info().rss
    except ImportError:  # pragma: no cover
        mem_byte = 0
    mem_kb = float(mem_byte) / 1024.0
    return mem_kb, mem_kb / 1024.0, mem_kb / 1024.0 / 1024.0


def _convert_to_words_batchfirst(seqlist, id2word) -> List[List[str]]:
    """[num_batch x seq_len] ids -> words (ref: utils/misc.py:344-365)."""
    arr = np.asarray(seqlist)
    return [[id2word.get(int(tok), PAD_TOKEN) if isinstance(id2word, dict)
             else id2word[int(tok)] for tok in row] for row in arr]


def detok_words(words: Sequence[str], use_type: str = "word",
                seqrev: bool = False) -> str:
    """Join tokens into an output line: skip <pad>, map <spc> to space, stop
    at </s> (ref: translate.py:174-194, utils/misc.py:42-62)."""
    out = []
    for word in words:
        if word == PAD_TOKEN:
            continue
        elif word == SPC_TOKEN:
            out.append(" ")
        elif word == EOS_TOKEN:
            break
        else:
            out.append(word)
    if not out:
        return ""
    if seqrev:
        out = out[::-1]
    return " ".join(out) if use_type == "word" else "".join(out)


def add2corpus(hyp_ids, ref_ids, id2word, hyp_corpus, ref_corpus,
               use_type: str = "char"):
    """Accumulate hyp/ref token lists for corpus BLEU
    (ref: utils/misc.py:35-91). ref_ids' leading BOS column is dropped."""
    hyp_toks = _convert_to_words_batchfirst(hyp_ids, id2word)
    ref_toks = _convert_to_words_batchfirst(np.asarray(ref_ids)[:, 1:], id2word)
    for i in range(len(hyp_toks)):
        hyp_line = detok_words(hyp_toks[i], use_type=use_type)
        ref_line = detok_words(ref_toks[i], use_type=use_type)
        hyp_corpus.append(hyp_line.split())
        ref_corpus.append([ref_line.split()])
    return hyp_corpus, ref_corpus


def print_config(config: Dict):
    print("\n-------- Config --------")
    for key, val in config.items():
        print("{}:{}".format(key, val))

def enable_compilation_cache():
    """Persistent XLA compilation cache (survives processes and rounds)."""
    import os

    import jax

    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
