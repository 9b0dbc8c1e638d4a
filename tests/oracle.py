"""Import the reference PyTorch GRL (read-only at /root/reference) as a golden
numerical oracle for parity tests.

The reference needs timm/fairscale/omegaconf only for trivial helpers
(to_2tuple, trunc_normal_, DropPath, checkpoint_wrapper, OmegaConf.create) — we
stub those so the genuine reference model code runs unmodified on CPU torch.
Nothing from the reference is copied into grlir; it is only *executed* to produce
expected outputs.
"""

import collections.abc as cabc
import sys
import types

_REFERENCE_PATH = "/root/reference"
_installed = False


def _install_stubs():
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tml = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        if isinstance(x, cabc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a, b)
        return t

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity is all the oracle needs
            return x

    tml.to_2tuple = to_2tuple
    tml.trunc_normal_ = trunc_normal_
    tml.DropPath = DropPath
    timm.models = tm
    tm.layers = tml
    sys.modules.update({"timm": timm, "timm.models": tm, "timm.models.layers": tml})

    fs = types.ModuleType("fairscale")
    fsn = types.ModuleType("fairscale.nn")
    fsn.checkpoint_wrapper = lambda m, offload_to_cpu=False: m
    fs.nn = fsn
    sys.modules.update({"fairscale": fs, "fairscale.nn": fsn})

    oc = types.ModuleType("omegaconf")

    class _NS(dict):
        # OmegaConf non-struct mode returns None for missing keys — the
        # reference relies on this (e.g. args.separable_conv_act is never
        # actually forwarded by GRL.__init__, grl.py:302-308)
        def __getattr__(self, k):
            return self.get(k)

    class OmegaConf:
        @staticmethod
        def create(d):
            return _NS(d)

    oc.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = oc

    # torchmetrics: reference metric modules subclass torchmetrics.Metric but
    # the oracle only calls their pure functions
    tmx = types.ModuleType("torchmetrics")

    class Metric:
        def __init__(self, **kwargs):
            pass

        def add_state(self, *a, **k):
            pass

    tmx.Metric = Metric
    tmx.PeakSignalNoiseRatio = Metric
    sys.modules["torchmetrics"] = tmx

    # scipy.ndimage.filters was removed in modern scipy; alias it
    import scipy.ndimage as _ndi

    sys.modules.setdefault("scipy.ndimage.filters", _ndi)

    # torchvision: only imported for utilities the oracle never calls
    # (utils_bsr/utils_image.py:12 `from torchvision.utils import make_grid`).
    # Keep the stubs plain modules — a raising __getattr__ breaks torch.optim,
    # which inspects sys.modules entries for dunders.
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvu = types.ModuleType("torchvision.utils")
    tv.transforms = tvt
    tv.utils = tvu
    tvu.make_grid = lambda *a, **k: None
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.utils", tvu)

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    _installed = True


def reference_grl(**kwargs):
    """Instantiate the reference torch GRL in eval mode."""
    _install_stubs()
    from models.networks.grl import GRL as TorchGRL  # noqa: reference import

    model = TorchGRL(**kwargs)
    model.eval()
    return model


def reference_module(path):
    """Import an arbitrary reference module, e.g. 'utils.matlab_functions'."""
    _install_stubs()
    import importlib

    return importlib.import_module(path)


def state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
