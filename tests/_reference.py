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


def derandomize_zeros(module, std: float = 0.02, seed: int = 0):
    """Fill zero-initialized parameters with random values.

    The reference zero-inits every transformer proj_out and ResBlock/UNet
    output conv (zero_module), so at random init the WHOLE network output is
    identically zero — a fresh-init parity test then passes no matter what
    the interior computes. Randomizing those weights makes golden-tensor
    comparisons actually exercise the full path.
    """
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in module.named_parameters():
            if p.numel() and float(p.abs().max()) == 0.0:
                p.normal_(0, std, generator=g)
    return module


def ref_module(name: str):
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", VGG16_Weights=object, vgg16=object)
    tv.transforms = _stub("torchvision.transforms")
    _stub("easydict", EasyDict=dict)
    _stub("tensorboardX", SummaryWriter=object)
    om = _stub("omegaconf")   # lazily imported by openaimodel.py:478
    om.listconfig = _stub("omegaconf.listconfig",
                          ListConfig=type("ListConfig", (), {}))
    return importlib.import_module(name)
