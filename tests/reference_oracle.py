"""Import the read-only reference PyTorch code as a numerical test oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used here purely
as an executable spec: we instantiate its modules, copy their weights into our
pytrees via the converter, and assert numerical/token parity. Nothing from it
is vendored into this repo.
"""

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load_reference():
    """Make the reference package importable (stubbing its unused bpemb dep).

    Also shims torch 1.1-era APIs the reference relies on: masked_fill with a
    uint8 mask (ref: models/Seq2seq.py:387) raises on torch 2.x, so masks are
    cast to bool transparently.
    """
    if "bpemb" not in sys.modules:
        stub = types.ModuleType("bpemb")
        stub.BPEmb = object
        sys.modules["bpemb"] = stub
    if REFERENCE_PATH not in sys.path:
        # APPEND, never insert(0): the reference also ships top-level
        # `translate.py` / `train.py`, and fronting its path makes a later
        # `import translate` in other tests resolve (and cache) the
        # reference CLI instead of this repo's.
        sys.path.append(REFERENCE_PATH)

    import torch

    if not getattr(torch.Tensor.masked_fill, "_stjep_shim", False):
        _orig_mf = torch.Tensor.masked_fill
        _orig_mf_ = torch.Tensor.masked_fill_

        def masked_fill(self, mask, value):
            return _orig_mf(self, mask.bool(), value)

        def masked_fill_(self, mask, value):
            return _orig_mf_(self, mask.bool(), value)

        masked_fill._stjep_shim = True
        masked_fill_._stjep_shim = True
        torch.Tensor.masked_fill = masked_fill
        torch.Tensor.masked_fill_ = masked_fill_
