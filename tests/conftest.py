"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: multi-device tests on CPU
device-count simulation).

Set ANYREF_TEST_PLATFORM=axon (or tpu) to run the suite against the real
chip instead — used to validate Pallas kernel numerics on hardware
(interpret-mode CPU runs cover logic; compiled-Mosaic runs cover the
hardware lowering): `ANYREF_TEST_PLATFORM=axon pytest tests/test_flash.py`.
"""

import os

_PLATFORM = os.environ.get("ANYREF_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
flags = os.environ.get("XLA_FLAGS", "")
if _PLATFORM == "cpu" and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the axon TPU PJRT plugin in every
# interpreter and pins jax_platforms=axon; override back to CPU *after* jax
# import so tests never contend for the single TPU tunnel.
import jax

jax.config.update("jax_platforms", _PLATFORM)

import sys

REFERENCE_ROOT = "/root/reference"


def _stub_missing_modules():
    """The reference imports torchvision/ftfy at module import time; neither
    is installed. Golden-parity tests only exercise pure-torch modeling code,
    so stub the imports."""
    import importlib.machinery
    import types
    names = ("torchvision", "torchvision.ops", "torchvision.ops.boxes",
             "torchvision.transforms", "torchvision.transforms.functional",
             "ftfy", "timm", "timm.models", "timm.models.layers",
             "iopath", "iopath.common", "iopath.common.file_io")
    for name in names:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []  # mark as package so submodule imports resolve
            # real ModuleSpec so importlib.util.find_spec() works on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                          is_package=True)
            sys.modules[name] = mod
            parent, _, child = name.rpartition(".")
            if parent:
                setattr(sys.modules[parent], child, mod)
    sys.modules["torchvision.ops.boxes"].batched_nms = None
    sys.modules["torchvision.ops.boxes"].box_area = None
    sys.modules["torchvision.transforms.functional"].resize = None
    sys.modules["torchvision.transforms.functional"].to_pil_image = None

    # timm layers used by ImageBind transformer (frozen/eval => identity)
    import torch as _torch

    class _DropPath(_torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    def _trunc_normal_(t, std=1.0, **k):
        with _torch.no_grad():
            t.normal_(0, std)
        return t

    sys.modules["timm.models.layers"].DropPath = _DropPath
    sys.modules["timm.models.layers"].trunc_normal_ = _trunc_normal_
    sys.modules["iopath.common.file_io"].g_pathmgr = None


def reference_on_path():
    """Make /root/reference importable (guarded: read-only usage)."""
    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
