"""Helper to import the read-only PyTorch reference for golden-tensor tests.

The reference at /root/reference is used strictly as a numerical oracle
(random-weight modules run on CPU); none of its code is vendored here.
Missing optional deps of the reference (torchvision, easydict, tensorboardX)
are stubbed out — the modules we compare against never touch them.
"""
import importlib
import sys
import types

REF_PATH = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec: importlib.util.find_spec raises ValueError on
    # in-sys.modules modules whose __spec__ is None (transformers probes
    # torchvision availability that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def ref_module(name: str):
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", VGG16_Weights=object, vgg16=object)
    tv.transforms = _stub("torchvision.transforms")
    _stub("easydict", EasyDict=dict)
    _stub("tensorboardX", SummaryWriter=object)
    return importlib.import_module(name)
