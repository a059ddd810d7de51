"""Load the torch reference at /root/reference as a numerical ORACLE.

The golden-parity tests (test_golden_parity.py) instantiate the reference's
torch modules with random init, port their state_dicts through
`roma_tpu.models.port`, and assert our flax modules produce the same numbers.
Nothing from the reference is copied into roma_tpu — it is imported here,
at test time only, strictly as a black box to diff against.

torchvision / kornia / wandb are not installed in this environment, but on
the code paths we exercise they are import-time names only — minimal stubs
are installed before importing `romatch`. The one real piece is
`vgg19_bn`: the reference wraps `torchvision.models.vgg19_bn().features`
(encoders.py:64), so the stub provides a torch Sequential with the standard
VGG19-BN `features` layout (conv indices 0,3,7,10,14,17,20,23,27,30,33,36 —
the layout `roma_tpu.models.port._VGG_CONV_IDX` ports from). That Sequential
doubles as the conv/BN-semantics oracle for our flax VGG19.
"""

from __future__ import annotations

import sys
import types

import pytest


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def make_vgg19_bn_features():
    """torch Sequential with torchvision's vgg19_bn `features` layout
    (cfg 'E' + batch_norm: [64,64,M,128,128,M,256x4,M,512x4,M,512x4,M])."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers: list = []
    c_in = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [
                tnn.Conv2d(c_in, v, kernel_size=3, padding=1),
                tnn.BatchNorm2d(v),
                tnn.ReLU(inplace=True),
            ]
            c_in = v
    return tnn.Sequential(*layers)


def load_romatch():
    """Import and return the reference `romatch` package (skips on failure)."""
    torch = pytest.importorskip("torch")

    if "romatch" in sys.modules:
        return sys.modules["romatch"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _VggStub:
        def __init__(self, pretrained=False, **kw):
            self.features = make_vgg19_bn_features()

    class _AnyCtor:
        """Constructible-with-anything placeholder for transforms that are
        built at module/matcher init but never called on our test paths."""

        def __init__(self, *a, **kw):
            pass

        def __call__(self, *a, **kw):
            raise NotImplementedError("stubbed torchvision transform")

    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", vgg19_bn=_VggStub)
    tv.transforms = _stub(
        "torchvision.transforms",
        ToTensor=_AnyCtor, Compose=_AnyCtor, Resize=_AnyCtor,
        Normalize=_AnyCtor,
        InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"),
    )
    tv.transforms.functional = _stub(
        "torchvision.transforms.functional",
        InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"),
    )
    k = _stub("kornia")
    k.augmentation = _stub("kornia.augmentation")
    k.geometry = _stub("kornia.geometry")
    k.geometry.transform = _stub(
        "kornia.geometry.transform", warp_perspective=None
    )
    _stub("wandb", log=lambda *a, **kw: None, run=None)
    _stub(
        "loguru",
        logger=types.SimpleNamespace(
            info=lambda *a, **kw: None, warning=lambda *a, **kw: None
        ),
    )

    try:
        import romatch  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference romatch not importable: {e}")
    return sys.modules["romatch"]


def to_numpy(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return t


def nchw_to_nhwc(t):
    return to_numpy(t).transpose(0, 2, 3, 1)
