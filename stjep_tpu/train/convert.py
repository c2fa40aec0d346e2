"""PyTorch -> JAX checkpoint conversion.

Maps the reference model's named parameters (ref: models/Seq2seq.py module
tree; torch.nn.LSTM cuDNN layouts with (i,f,g,o) gate order) onto this
framework's pytree. The parity gate is token-identical greedy decode after
conversion (BASELINE.md).

Layout rules:
- torch Linear weight [out, in]  -> 'w' [in, out] (transposed); bias -> 'b'
- torch LSTM weight_ih_l0 [4H, D] -> 'w_ih' [D, 4H] (transposed); gate order
  (i, f, g, o) is shared, so no reordering.
- '_reverse' LSTM params -> the 'bwd' direction of a bilstm
- LayerNorm weight/bias -> scale/bias
- Embedding weight -> the table itself
- reference 'dec.l{i}' residual stack -> 'dec_l{i}'
- reference 'enc_layers.{i}' / 'dec_layers.{i}' (standard: deep clones) ->
  'layers'[i]; universal type uses the shared template module 'enc'/'dec'
  -> 'layers'[0]. The unused standard-type template params are dropped.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

import jax.numpy as jnp

from stjep_tpu.config import ModelConfig

_LSTM_LEAVES = {
    "weight_ih_l0": ("w_ih", True),
    "weight_hh_l0": ("w_hh", True),
    "bias_ih_l0": ("b_ih", False),
    "bias_hh_l0": ("b_hh", False),
}


def _set_path(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_named_params(
    named: Dict[str, np.ndarray],
    cfg: ModelConfig,
    emb_dyn_ave: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Convert {torch_param_name: np.ndarray} to this framework's pytree.

    `named` uses the reference Seq2seq naming (e.g. from
    `{n: p.detach().numpy() for n, p in model.named_parameters()}`).
    Works for bare LAS checkpoints too (names starting with 'encoder.' /
    'decoder.' get an implicit 'las.' prefix).
    """
    tree: Dict[str, Any] = {}
    # layer lists are collected then converted to python lists
    enc_layers: Dict[int, Dict] = {}
    dec_layers: Dict[int, Dict] = {}

    for name, arr in named.items():
        if name.startswith("encoder.") or name.startswith("decoder."):
            name = "las." + name
        parts = name.split(".")

        # skip the unused standard-type template modules (ref: TFEnc.py:51,58)
        if cfg.transformer_type == "standard":
            if parts[0] in ("enc_src", "dec_tgt") and parts[1] in ("enc", "dec"):
                continue

        leaf = parts[-1]

        # ---- LSTM params -------------------------------------------------
        m = re.match(r"(weight|bias)_(ih|hh)_l0(_reverse)?$", leaf)
        if m:
            base = f"{m.group(1)}_{m.group(2)}_l0"
            new_leaf, transpose = _LSTM_LEAVES[base]
            is_reverse = m.group(3) is not None
            mod_path = parts[:-1]
            val = arr.T if transpose else arr
            if any(p.startswith("acous_enc_l") for p in mod_path):
                # pyramid bilstm: las.encoder.acous_enc_l{k}
                direction = "bwd" if is_reverse else "fwd"
                path = [p for p in mod_path] + [direction, new_leaf]
            else:
                # residual decoder stack: las.decoder.dec.l{i} -> dec_l{i}
                assert not is_reverse
                path = []
                i = 0
                while i < len(mod_path):
                    if mod_path[i] == "dec" and i + 1 < len(mod_path) and re.match(
                        r"l\d+$", mod_path[i + 1]
                    ):
                        path.append("dec_" + mod_path[i + 1])
                        i += 2
                    else:
                        path.append(mod_path[i])
                        i += 1
                path.append(new_leaf)
            _set_path(tree, path, jnp.asarray(val))
            continue

        # ---- everything else ----------------------------------------------
        mod_path = parts[:-1]
        parent = mod_path[-1] if mod_path else ""

        if parent.endswith("embedder") or parent in ("embedder",):
            # nn.Embedding weight -> table
            assert leaf == "weight"
            _set_path(tree, mod_path, jnp.asarray(arr))
            continue

        if parent in ("layer_norm", "norm"):
            new_leaf = "scale" if leaf == "weight" else "bias"
            val = jnp.asarray(arr)
        elif leaf == "weight":
            new_leaf, val = "w", jnp.asarray(arr.T)
        elif leaf == "bias":
            new_leaf, val = "b", jnp.asarray(arr)
        else:
            raise ValueError(f"unrecognized param {name}")

        # transformer layer-list handling
        path = list(mod_path) + [new_leaf]
        if len(path) >= 3 and path[0] in ("enc_src", "dec_tgt"):
            if path[1] in ("enc_layers", "dec_layers"):
                idx = int(path[2])
                store = enc_layers if path[0] == "enc_src" else dec_layers
                sub = store.setdefault(idx, {})
                _set_path(sub, path[3:], val)
                # remember owner for later assembly
                sub["__owner__"] = path[0]
                continue
            if path[1] in ("enc", "dec") and cfg.transformer_type == "universal":
                store = enc_layers if path[0] == "enc_src" else dec_layers
                sub = store.setdefault(0, {})
                _set_path(sub, path[2:], val)
                sub["__owner__"] = path[0]
                continue
        _set_path(tree, path, val)

    for store, owner in ((enc_layers, "enc_src"), (dec_layers, "dec_tgt")):
        if store:
            layers = []
            for i in sorted(store):
                sub = store[i]
                sub.pop("__owner__", None)
                layers.append(sub)
            tree.setdefault(owner, {})["layers"] = layers

    if cfg.share_embedder:
        # torch dedups shared modules to the first-registered name
        if "dec_embedder" not in tree and "enc_embedder" in tree:
            tree["dec_embedder"] = tree["enc_embedder"]
        if "enc_embedder" not in tree and "dec_embedder" in tree:
            tree["enc_embedder"] = tree["dec_embedder"]

    if emb_dyn_ave is not None:
        tree["emb_dyn_ave"] = jnp.asarray(emb_dyn_ave)
    elif "emb_dyn_ave" not in tree:
        tree["emb_dyn_ave"] = jnp.zeros((cfg.dim_model,), jnp.float32)
    return tree


def convert_torch_model(model, cfg: ModelConfig) -> Dict[str, Any]:
    """Convenience: convert a live torch reference model (test oracle) or an
    unpickled reference checkpoint module."""
    named = {n: p.detach().cpu().numpy() for n, p in model.named_parameters()}
    emb_dyn = None
    if hasattr(model, "EMB_DYN_AVE"):
        emb_dyn = model.EMB_DYN_AVE.detach().cpu().numpy().reshape(-1)
    return convert_named_params(named, cfg, emb_dyn_ave=emb_dyn)
