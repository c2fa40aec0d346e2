"""Feature staging compression: int8 quantization + device-resident cache.

The product training loop's bottleneck on tunnel-attached hosts is the
host->device transfer of the acoustic fbank features — the dominant tensor
by ~100x (ref analog: the reference re-stages every batch to the GPU each
step, ref: trainer/trainer_asr.py:219-233; it has no compression or cache).
Two TPU-native levers, composable:

- **int8 staging** (`quantize_batch`): per-utterance symmetric int8 with an
  fp scale; dequantized on device at the top of the train step, where the
  first consumer is an MXU matmul that reads low-precision operands anyway.
  4x fewer H2D bytes than float32, 2x fewer than bfloat16. CMVN'd fbank
  values are zero-centred with amax ~= 5 sigma, so the quantization step is
  ~amax/127 < 0.05 sigma — far below the feature noise floor (validated
  end-to-end: the staged recipe trains to the same dev WER/BLEU, see
  benchmarks/quality_synthetic_int8.json).

- **device-resident corpus cache** (`DeviceFeatureCache`): for corpora that
  fit in HBM (a 400 h fbank corpus is ~6 GB at int8), load + CMVN + quantize
  every utterance ONCE, upload once, and assemble each step's minibatch
  on-device with a gather by utterance row — so steady-state training moves
  only token ids and row indices over the link, and the per-epoch
  np.load/CMVN re-materialisation disappears with it.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from stjep_tpu.ops.masks import bucket_length, round_up8


def estimate_corpus_bytes(dataset, acous_bucket: int, feat_dtype) -> int:
    """Bytes DeviceFeatureCache.build would allocate for `dataset` at
    `feat_dtype`, WITHOUT loading any features: n x bucketed-T_max x D x
    itemsize (+ per-row scales when int8). D is read from the first npy
    header via mmap."""
    flis = dataset.train_acous_flis
    lens = dataset.train_acous_lengths
    if not flis or not any(flis):
        return 0
    t_max = bucket_length(int(round_up8(max(lens))), acous_bucket)
    probe = np.load(flis[0], mmap_mode="r")
    d = probe.shape[1]
    del probe
    feat_dtype = np.dtype(feat_dtype)
    n = len(flis)
    nbytes = n * t_max * d * feat_dtype.itemsize
    if feat_dtype == np.int8:
        nbytes += n * 4  # f32 scales
    return nbytes


def hbm_cache_budget(fraction: float = 0.5) -> int:
    """Free-HBM budget for a resident feature cache, in bytes.

    memory_stats() when the backend reports it (bytes_limit - bytes_in_use,
    scaled by `fraction` to leave room for params/activations/grads);
    otherwise a conservative default (half of a 16 GB v5e). Override with
    STJEP_CACHE_BUDGET_MB for odd deployments."""
    import os

    env = os.environ.get("STJEP_CACHE_BUDGET_MB")
    if env:
        return int(float(env) * 2 ** 20)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            return int(max(0, limit - in_use) * fraction)
    except Exception:  # backend without memory_stats (e.g. axon tunnel)
        pass
    return int(8 * 2 ** 30)


def quantize_batch(feats: np.ndarray, scale_dtype) -> Dict[str, np.ndarray]:
    """Per-utterance symmetric int8 quantization.

    feats: [..., B, T, D] float array; the last two axes are the utterance.
    Returns {"q": int8 like feats, "scale": scale_dtype [..., B]} with
    dequantization q.astype(scale.dtype) * scale[..., None, None].
    The scale's dtype doubles as the on-device dequant target dtype.
    """
    amax = np.max(np.abs(feats), axis=(-2, -1))
    scale = (amax / 127.0).astype(np.float32)
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.rint(feats / safe[..., None, None])
    q = np.clip(q, -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(scale_dtype)}


def dequantize(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """On-device inverse of quantize_batch (scale carries the target dtype)."""
    return q.astype(scale.dtype) * scale[..., None, None]


class DeviceFeatureCache:
    """Whole-corpus acoustic features resident on device.

    Built once per (dataset, trainer) from the dataset's post-filter
    utterance list; per-step minibatches are assembled INSIDE the jitted
    train step with jnp.take by row index (see Trainer._build_step), so the
    cache pays one upload on epoch 1 and zero feature H2D afterwards.

    feats: [N, T_max, D] device array — int8 when quantized, else the
           staging float dtype.
    scale: [N] device array (dequant target dtype), or None when unquantized.
    T_max is pre-bucketed so every batch's bucketed length slices inside it.
    """

    def __init__(self, feats, scale, row_of_path: Dict[str, int],
                 t_max: int, nbytes: int):
        self.feats = feats
        self.scale = scale
        self._row = row_of_path
        self.t_max = t_max
        self.nbytes = nbytes

    @property
    def arrays(self) -> Dict[str, jnp.ndarray]:
        """The pytree passed into the jitted step (never donated)."""
        out = {"feats": self.feats}
        if self.scale is not None:
            out["scale"] = self.scale
        return out

    def rows(self, flis: List[str]) -> np.ndarray:
        return np.asarray([self._row[f] for f in flis], np.int32)

    @classmethod
    def build(cls, dataset, acous_bucket: int, feat_dtype,
              dequant_dtype=np.float32, mesh=None, chunk: int = 64,
              logger=None):
        """Load + CMVN + (maybe) quantize every utterance of `dataset`,
        upload once (replicated across the mesh when one is active).

        feat_dtype: np.int8 for quantized storage, else the float staging
        dtype (np.float32 / ml_dtypes.bfloat16)."""
        flis = dataset.train_acous_flis
        lens = dataset.train_acous_lengths
        spks = dataset.train_acous_spkids
        assert flis, "device cache: dataset has no acoustics"
        n = len(flis)
        t_max = bucket_length(int(round_up8(max(lens))), acous_bucket)
        feat_dtype = np.dtype(feat_dtype)
        quant = feat_dtype == np.int8

        probe = np.load(flis[0], mmap_mode="r")
        d = probe.shape[1]
        del probe

        buf = np.zeros((n, t_max, d), feat_dtype)
        scales = np.zeros((n,), np.dtype(dequant_dtype)) if quant else None
        for st in range(0, n, chunk):
            ed = min(st + chunk, n)
            norm = (dataset.load_mu_std(spks[st:ed])
                    if dataset.acous_norm else None)
            arr = dataset.load_acous(flis[st:ed], norm_param=norm,
                                     lengths=lens[st:ed])  # [m, t_chunk, D]
            t = min(arr.shape[1], t_max)
            if quant:
                qd = quantize_batch(arr[:, :t], scales.dtype)
                buf[st:ed, :t] = qd["q"]
                scales[st:ed] = qd["scale"]
            else:
                buf[st:ed, :t] = arr[:, :t].astype(feat_dtype)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())
            feats_dev = jax.device_put(buf, repl)
            scale_dev = (jax.device_put(scales, repl)
                         if scales is not None else None)
        else:
            feats_dev = jax.device_put(buf)
            scale_dev = jax.device_put(scales) if scales is not None else None

        nbytes = buf.nbytes + (scales.nbytes if scales is not None else 0)
        if logger is not None:
            logger.info(
                "device feature cache: %d utterances, [%d, %d, %d] %s "
                "(%.1f MB on device)", n, n, t_max, d, feat_dtype,
                nbytes / 2 ** 20)
        return cls(feats_dev, scale_dev, {f: i for i, f in enumerate(flis)},
                   t_max, nbytes)


def gather_features(cache_arrays: Dict[str, jnp.ndarray], idx: jnp.ndarray,
                    t_bucket: int) -> jnp.ndarray:
    """On-device minibatch assembly from a resident cache (traced inside the
    train step): gather rows, slice the static time bucket, dequantize."""
    raw = jnp.take(cache_arrays["feats"], idx, axis=0)[:, :t_bucket]
    if "scale" in cache_arrays:
        return dequantize(raw, jnp.take(cache_arrays["scale"], idx))
    return raw
