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
    """Make the reference package importable (stubbing its unused bpemb dep)."""
    if "bpemb" not in sys.modules:
        stub = types.ModuleType("bpemb")
        stub.BPEmb = object
        sys.modules["bpemb"] = stub
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
