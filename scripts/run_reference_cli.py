"""Run the read-only torch reference's CLIs unmodified, for A/B comparisons.

The reference (ref: train.py, translate.py) is a python-3.6/torch-1.1-era
codebase; running it in this environment needs four shims, all applied from
the OUTSIDE (nothing under /root/reference is touched):

- `bpemb` (ref: utils/dataset.py:10) and `torchtext` (ref:
  trainer/trainer_base.py:10) are not installed. bpemb is unused; torchtext
  is only used for `torchtext.data.metrics.bleu_score`
  (ref: trainer/trainer_asr.py:181), which stjep_tpu/utils/metrics.py
  reimplements with identical semantics — the stub routes to it.
- torch 2.x rejects uint8 masks in masked_fill (ref: models/Seq2seq.py:387);
  tests/reference_oracle.py already carries the cast-to-bool patch.
- `Seq2seq.__init__` unconditionally np.loads a RELATIVE hardcoded path
  (ref: models/Seq2seq.py:64-66). A dummy [512] array is planted under the
  working directory; its content is only consumed by MT/ST_BASE paths,
  which the A/B recipe (ASR -> ASR_ST) never exercises.

Usage: python scripts/run_reference_cli.py <workdir> train|translate [args...]

The process chdirs to <workdir> (so the relative EMB_DYN_AVE path and any
reference-relative writes land in scratch) and runs the reference CLI via
runpy with sys.argv set to the remaining args.
"""

import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EMB_DYN_AVE_REL = ("models/base/ted-asr-v001/eval_ted_train_STATS/"
                   "2020_09_02_04_10_44/dyn_emb_ave.npy")


def _install_torchtext_stub():
    if "torchtext" in sys.modules:
        return
    from stjep_tpu.utils.metrics import corpus_bleu

    torchtext = types.ModuleType("torchtext")
    data = types.ModuleType("torchtext.data")
    metrics = types.ModuleType("torchtext.data.metrics")

    def bleu_score(candidate_corpus, references_corpus,
                   max_n=4, weights=(0.25, 0.25, 0.25, 0.25)):
        return corpus_bleu(list(candidate_corpus),
                           [list(r) for r in references_corpus],
                           max_n=max_n, weights=weights)

    metrics.bleu_score = bleu_score
    data.metrics = metrics
    torchtext.data = data
    sys.modules["torchtext"] = torchtext
    sys.modules["torchtext.data"] = data
    sys.modules["torchtext.data.metrics"] = metrics


def main():
    workdir, which = sys.argv[1], sys.argv[2]
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    import numpy as np

    dummy = os.path.join(workdir, EMB_DYN_AVE_REL)
    os.makedirs(os.path.dirname(dummy), exist_ok=True)
    if not os.path.exists(dummy):
        np.save(dummy, np.zeros(512, np.float32))

    _install_torchtext_stub()
    from tests.reference_oracle import load_reference

    load_reference()  # bpemb stub + masked_fill shim + /root/reference path

    # torch-1.x DataLoader iterators had a py2-style .next()
    # (ref: trainer/trainer_asr.py:347); alias it on torch 2.x.
    from torch.utils.data import dataloader as _dl

    if not hasattr(_dl._BaseDataLoaderIter, "next"):
        _dl._BaseDataLoaderIter.next = _dl._BaseDataLoaderIter.__next__

    # torch 2.6 flipped torch.load's default to weights_only=True, which
    # rejects the reference's whole-model pickles (ref: modules/
    # checkpoint.py:150-180). Restore the 1.x default for these runs.
    import torch

    if not getattr(torch.load, "_stjep_wo_shim", False):
        _orig_load = torch.load

        def _load(*a, **kw):
            kw.setdefault("weights_only", False)
            return _orig_load(*a, **kw)

        _load._stjep_wo_shim = True
        torch.load = _load

    script = {"train": "/root/reference/train.py",
              "translate": "/root/reference/translate.py"}[which]
    sys.argv = [script] + sys.argv[3:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
