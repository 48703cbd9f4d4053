"""Import helper for the reference implementation at /root/reference.

The reference's torch modules are used as numerical ground truth in parity
tests (random weights, CPU). Missing optional deps of the reference are
shimmed so the modules import under this environment.
"""
import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference")


def load_reference():
    if not REF.exists():
        pytest.skip("reference repo not available")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    # torchaudio is absent in this environment; the reference only touches it
    # in code paths our parity tests never exercise (SincConv, file IO).
    try:
        import torchaudio  # noqa: F401
    except Exception:
        import importlib.machinery
        ta = types.ModuleType("torchaudio")
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.transforms = types.ModuleType("torchaudio.transforms")
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional
        sys.modules["torchaudio.transforms"] = ta.transforms
    # transformers >= 4.46 dropped some legacy modules the reference imports.
    try:
        import transformers.utils.model_parallel_utils  # noqa: F401
    except Exception:
        shim = types.ModuleType("transformers.utils.model_parallel_utils")
        shim.assert_device_map = lambda *a, **k: None
        shim.get_device_map = lambda *a, **k: {}
        sys.modules["transformers.utils.model_parallel_utils"] = shim
    return REF
