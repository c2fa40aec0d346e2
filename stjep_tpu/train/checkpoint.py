"""Checkpoint manager: pytree msgpack checkpoints in timestamped dirs.

Same directory discipline as the reference Checkpoint
(ref: modules/checkpoint.py:11-209): timestamped subdirs under
<expt>/checkpoints (or <expt>/checkpoints_epoch/<n>), keep_num pruning,
latest/2nd/3rd-latest lookup, plus checkpoint weight averaging
(ref: utils/misc.py:94-113). Contents are flax-serialized pytrees + JSON
metadata instead of torch pickles, so they are host/device portable by
construction (the reference needs a CPU remap hack, ref: checkpoint.py:159-164).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax
from flax import serialization

from stjep_tpu.parallel.distributed import barrier, is_primary

CHECKPOINT_DIR_NAME = "checkpoints"
CHECKPOINT_EPOCH_DIR_NAME = "checkpoints_epoch"
PARAMS_NAME = "params.msgpack"
OPT_NAME = "opt_state.msgpack"
META_NAME = "meta.json"
INPUT_VOCAB_FILE = "input_vocab.json"
OUTPUT_VOCAB_FILE = "output_vocab.json"


def _gather_tree(tree):
    """Materialise a (possibly cross-host sharded) pytree as host numpy.

    Fully-addressable leaves (single process, or replicated/TP within this
    host's devices) are a plain device_get; leaves sharded across processes
    are allgathered so process 0 can serialise the full value. Collective:
    every process must call this.
    """

    def fn(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(fn, tree)


class Checkpoint:
    """Bundle of (params, opt_state, epoch, step, vocabs) with save/load."""

    def __init__(self, params, opt_state=None, epoch: int = 0, step: int = 0,
                 input_vocab=None, output_vocab=None, path: Optional[str] = None,
                 model_config: Optional[Dict] = None):
        self.params = params
        self.opt_state = opt_state
        self.epoch = epoch
        self.step = step
        self.input_vocab = input_vocab or []
        self.output_vocab = output_vocab or []
        self.model_config = model_config
        self._path = path

    @property
    def path(self) -> str:
        if self._path is None:
            raise LookupError("The checkpoint has not been saved.")
        return self._path

    # ----------------------------------------------------------- saving

    def _write(self, path: str) -> str:
        """Write the checkpoint dir.

        Multi-host: every process participates (arrays sharded across hosts
        are gathered collectively — skipping the call on non-primaries would
        deadlock), but only process 0 touches the filesystem; all processes
        sync before returning so a subsequent load sees a complete dir.
        """
        params = _gather_tree(self.params)
        opt_state = (
            _gather_tree(self.opt_state) if self.opt_state is not None else None
        )
        if is_primary():
            if os.path.exists(path):
                shutil.rmtree(path)
            os.makedirs(path)
            with open(os.path.join(path, PARAMS_NAME), "wb") as f:
                f.write(serialization.to_bytes(params))
            if opt_state is not None:
                with open(os.path.join(path, OPT_NAME), "wb") as f:
                    f.write(serialization.to_bytes(opt_state))
            with open(os.path.join(path, META_NAME), "w") as f:
                json.dump({"epoch": self.epoch, "step": self.step,
                           "model_config": self.model_config}, f)
            with open(os.path.join(path, INPUT_VOCAB_FILE), "w") as f:
                json.dump(list(self.input_vocab), f)
            with open(os.path.join(path, OUTPUT_VOCAB_FILE), "w") as f:
                json.dump(list(self.output_vocab), f)
        barrier("ckpt_write:" + os.path.basename(path))
        self._path = path
        return path

    def save(self, experiment_dir: str) -> str:
        """Timestamped dir (ref: checkpoint.py:54-83); a microsecond suffix
        keeps names unique and lexicographically ordered."""
        # ONE clock read for both parts: a second strftime/time() pair can
        # straddle a second rollover and emit old-second + new-microseconds,
        # which sorts BEFORE the previous checkpoint and breaks
        # get_latest_checkpoint / rollback ordering
        now = time.time()
        date_time = time.strftime("%Y_%m_%d_%H_%M_%S", time.localtime(now))
        date_time += "_{:06d}".format(int((now % 1) * 1e6))
        return self._write(
            os.path.join(experiment_dir, CHECKPOINT_DIR_NAME, date_time)
        )

    def save_epoch(self, experiment_dir: str, epoch: int) -> str:
        """Per-epoch dirs when training without a dev set
        (ref: checkpoint.py:85-113)."""
        return self._write(
            os.path.join(experiment_dir, CHECKPOINT_EPOCH_DIR_NAME, str(epoch))
        )

    def save_customise(self, dir_path: str) -> str:
        """ref: checkpoint.py:115-136."""
        return self._write(dir_path)

    def rm_old(self, experiment_dir: str, keep_num: int = 3):
        """Prune to keep_num newest (ref: checkpoint.py:138-148)."""
        checkpoints_path = os.path.join(experiment_dir, CHECKPOINT_DIR_NAME)
        all_times = sorted(os.listdir(checkpoints_path), reverse=True)
        for name in all_times[keep_num:]:
            shutil.rmtree(os.path.join(checkpoints_path, name))

    # ---------------------------------------------------------- loading

    @classmethod
    def load(cls, path: str, params_template=None, opt_state_template=None):
        """Load a checkpoint dir. Templates (matching pytree structures)
        restore exact array types; without them, raw nested dicts of
        numpy arrays are returned for params and opt_state is skipped."""
        with open(os.path.join(path, PARAMS_NAME), "rb") as f:
            raw = f.read()
        if params_template is not None:
            params = serialization.from_bytes(params_template, raw)
        else:
            params = serialization.msgpack_restore(raw)
        opt_state = None
        opt_path = os.path.join(path, OPT_NAME)
        if opt_state_template is not None and os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                opt_state = serialization.from_bytes(opt_state_template, f.read())
        meta = {"epoch": 0, "step": 0}
        meta_path = os.path.join(path, META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        vin: List[str] = []
        vout: List[str] = []
        if os.path.exists(os.path.join(path, INPUT_VOCAB_FILE)):
            with open(os.path.join(path, INPUT_VOCAB_FILE)) as f:
                vin = json.load(f)
            with open(os.path.join(path, OUTPUT_VOCAB_FILE)) as f:
                vout = json.load(f)
        return cls(params, opt_state=opt_state, epoch=meta["epoch"],
                   step=meta["step"], input_vocab=vin, output_vocab=vout,
                   path=path, model_config=meta.get("model_config"))

    @classmethod
    def get_latest_checkpoint(cls, experiment_path: str) -> Optional[str]:
        """ref: checkpoint.py:183-195."""
        checkpoints_path = os.path.join(experiment_path, CHECKPOINT_DIR_NAME)
        if not os.path.isdir(checkpoints_path):
            return None
        all_times = sorted(os.listdir(checkpoints_path), reverse=True)
        if not all_times:
            return None
        return os.path.join(checkpoints_path, all_times[0])

    @classmethod
    def get_secondlast_checkpoint(cls, experiment_path: str) -> Optional[str]:
        checkpoints_path = os.path.join(experiment_path, CHECKPOINT_DIR_NAME)
        all_times = sorted(os.listdir(checkpoints_path), reverse=True)
        return os.path.join(checkpoints_path, all_times[1])

    @classmethod
    def get_thirdlast_checkpoint(cls, experiment_path: str) -> Optional[str]:
        checkpoints_path = os.path.join(experiment_path, CHECKPOINT_DIR_NAME)
        all_times = sorted(os.listdir(checkpoints_path), reverse=True)
        return os.path.join(checkpoints_path, all_times[2])


def upgrade_params(raw, template, logger=None):
    """Fill params missing from an older checkpoint with template values.

    The functional analog of the reference's `check_var` back-compat shim
    that default-injects attributes absent from old pickled models
    (ref: models/Seq2seq.py:906-914): any leaf present in the template but
    absent from the loaded tree keeps its freshly-initialised value; loaded
    leaves with matching shapes win.
    """
    from stjep_tpu.train.policies import get_path, has_path, map_with_path

    def fn(name, leaf):
        path = tuple(name.split("."))
        if has_path(raw, path):
            cand = get_path(raw, path)
            if np.shape(cand) == np.shape(leaf):
                import jax.numpy as jnp

                return jnp.asarray(cand, dtype=leaf.dtype)
        if logger is not None:
            logger.info("checkpoint missing %s - keeping initialised value",
                        name)
        return leaf

    return map_with_path(template, fn)


def combine_weights(path: str, params_template=None):
    """Average all checkpoints under `path` leaf-wise
    (ref: utils/misc.py:94-113). Returns the averaged params pytree."""
    ckpt_dirs = [os.path.join(path, d) for d in sorted(os.listdir(path))]
    trees = [
        Checkpoint.load(d, params_template=params_template).params
        for d in ckpt_dirs
    ]
    n = float(len(trees))

    def _avg(*leaves):
        acc = sum(np.asarray(l, dtype=np.float64) for l in leaves) / n
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(_avg, *trees)


def log_ckpts(ckpt_path: str, out_path: str):
    """ref: utils/misc.py:116-121."""
    with open(os.path.join(out_path, "ckpts.log"), "w") as f:
        for ckpt in sorted(os.listdir(ckpt_path)):
            f.write("{}\n".format(ckpt))
