"""Shared helper: make the reference tree (/root/reference/pet, PyTorch)
importable on CPU by stubbing its apex / torchvision / compiled-_C deps.
Used by the oracle tests that drive the reference's own implementations."""

import sys
import types


def install_reference_stubs():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        amp = types.ModuleType("apex.amp")
        amp.float_function = lambda f: f
        amp.half_function = lambda f: f
        apex.amp = amp
        sys.modules["apex"] = apex
        sys.modules["apex.amp"] = amp
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = lambda *a, **k: None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    if "pet.lib.ops._C" not in sys.modules:
        class _CModule(types.ModuleType):
            def __getattr__(self, name):
                def missing(*a, **k):
                    raise NotImplementedError(name)
                return missing
        sys.modules["pet.lib.ops._C"] = _CModule("pet.lib.ops._C")
