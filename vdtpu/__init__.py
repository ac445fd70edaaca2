"""vdtpu — TPU-native Versatile Diffusion framework.

Public surface (lazy imports keep `import vdtpu` light):
  vdtpu.VDSystem / vdtpu.VDInference / vdtpu.vd_inference — serving
  vdtpu.model_cfg_bank — the named model-config bank
See README.md for the component map and PARITY.md for reference coverage.
"""

__version__ = "0.1.0"

_LAZY = {
    "VDSystem": ("vdtpu.serving.api", "VDSystem"),
    "VDInference": ("vdtpu.serving.api", "VDInference"),
    "vd_inference": ("vdtpu.serving.api", "vd_inference"),
    "model_cfg_bank": ("vdtpu.config.bank", "model_cfg_bank"),
    "VDModel": ("vdtpu.models.vd", "VDModel"),
    "DDIMSampler": ("vdtpu.sampling.ddim", "DDIMSampler"),
    "BatchingQueue": ("vdtpu.serving.queue", "BatchingQueue"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'vdtpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
