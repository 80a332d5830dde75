"""Import the reference sgmse package (at /root/reference) on CPU torch.

The reference JIT-compiles CUDA extensions at import time
(sgmse/backbones/ncsnpp_utils/op/upfirdn2d.py:10-16, op/fused_act.py:11-17),
which is impossible here. We pre-seed ``sys.modules`` with a stand-in ``op``
module backed by pure-torch implementations written from the op semantics
(zero-insert upsample -> true FIR convolution -> stride downsample;
scaled leaky-ReLU with broadcast bias). Third-party packages the reference
imports but that are absent from this image (pytorch_lightning, torch_ema,
torchaudio, pesq, pystoi, pydub, wandb) get minimal functional stubs — just
enough for ``sgmse.backbones`` / ``sgmse.model`` construction and `_step`.

This makes the *actual* reference model graph importable ground truth for
golden tests (tests/test_reference_parity.py), replacing round-trip-only
converter trust.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _make_upfirdn2d():
    import torch
    import torch.nn.functional as F

    def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
        """Upsample by zero insertion, convolve with the (true-convolution)
        FIR kernel, downsample; pad[0]/pad[1] apply to both spatial axes.
        Matches the contract of the reference CUDA op
        (op/upfirdn2d.py:145-156)."""
        b, c, h, w = x.shape
        x = x.reshape(b * c, 1, h, w)
        if up > 1:
            z = x.new_zeros(b * c, 1, h * up, w * up)
            z[:, :, ::up, ::up] = x
            x = z
        p0, p1 = int(pad[0]), int(pad[1])
        x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
        if p0 < 0 or p1 < 0:
            x = x[
                :, :,
                max(-p0, 0): x.shape[2] - max(-p1, 0),
                max(-p0, 0): x.shape[3] - max(-p1, 0),
            ]
        w_f = torch.flip(kernel, (0, 1)).to(x.dtype)[None, None]
        y = F.conv2d(x, w_f)
        y = y[:, :, ::down, ::down]
        return y.reshape(b, c, y.shape[2], y.shape[3])

    return upfirdn2d


def _make_fused_act():
    import torch
    import torch.nn.functional as F

    def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            x = x + bias.reshape(1, -1, *([1] * (x.ndim - 2)))
        return F.leaky_relu(x, negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(
                x, self.bias, self.negative_slope, self.scale
            )

    return fused_leaky_relu, FusedLeakyReLU


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_third_party_stubs():
    import torch

    def _unavailable(*_a, **_k):
        raise RuntimeError("stubbed module — not available in this image")

    _stub("torchaudio", load=_unavailable, save=_unavailable)
    _stub("pesq", pesq=_unavailable)
    _stub("pystoi", stoi=_unavailable)
    _stub("pydub", AudioSegment=object)
    _stub("wandb", init=_unavailable, log=_unavailable)
    _stub("soundfile", read=_unavailable, write=_unavailable)

    if "pytorch_lightning" not in sys.modules:
        class _HParams(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        class LightningModule(torch.nn.Module):
            """Just enough of the Lightning API for __init__/_step."""

            def save_hyperparameters(self, *args, ignore=(), **kw):
                self._hparams = _HParams()

            @property
            def hparams(self):
                return getattr(self, "_hparams", _HParams())

            def log(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                pass

        class LightningDataModule:
            pass

        class Trainer:
            def __init__(self, *a, **k):
                raise RuntimeError("stub Trainer cannot run")

        _stub(
            "pytorch_lightning",
            LightningModule=LightningModule,
            LightningDataModule=LightningDataModule,
            Trainer=Trainer,
        )

    if "torch_ema" not in sys.modules:
        class ExponentialMovingAverage:
            """Functional subset of torch-ema matching its state_dict
            layout ({'decay','num_updates','shadow_params','collected_params'})."""

            def __init__(self, parameters, decay: float):
                self.decay = decay
                self.num_updates = 0
                self.shadow_params = [
                    p.clone().detach() for p in parameters if p.requires_grad
                ]
                self.collected_params = None

            def update(self, parameters):
                self.num_updates += 1
                d = min(
                    self.decay,
                    (1 + self.num_updates) / (10 + self.num_updates),
                )
                ps = [p for p in parameters if p.requires_grad]
                with __import__("torch").no_grad():
                    for s, p in zip(self.shadow_params, ps):
                        s.sub_((1.0 - d) * (s - p))

            def store(self, parameters):
                self.collected_params = [
                    p.clone() for p in parameters if p.requires_grad
                ]

            def copy_to(self, parameters):
                ps = [p for p in parameters if p.requires_grad]
                for s, p in zip(self.shadow_params, ps):
                    p.data.copy_(s.data)

            def restore(self, parameters):
                ps = [p for p in parameters if p.requires_grad]
                for c, p in zip(self.collected_params, ps):
                    p.data.copy_(c.data)
                self.collected_params = None

            def state_dict(self):
                return {
                    "decay": self.decay,
                    "num_updates": self.num_updates,
                    "shadow_params": self.shadow_params,
                    "collected_params": self.collected_params,
                }

            def load_state_dict(self, sd):
                self.decay = sd["decay"]
                self.num_updates = sd["num_updates"]
                self.shadow_params = list(sd["shadow_params"])
                self.collected_params = sd.get("collected_params")

        _stub("torch_ema", ExponentialMovingAverage=ExponentialMovingAverage)


def _install_op_stub():
    upfirdn2d = _make_upfirdn2d()
    fused_leaky_relu, FusedLeakyReLU = _make_fused_act()

    base = "sgmse.backbones.ncsnpp_utils.op"
    _stub(
        base + ".upfirdn2d",
        upfirdn2d=upfirdn2d,
        upfirdn2d_native=upfirdn2d,
    )
    _stub(
        base + ".fused_act",
        fused_leaky_relu=fused_leaky_relu,
        FusedLeakyReLU=FusedLeakyReLU,
    )
    _stub(
        base,
        upfirdn2d=upfirdn2d,
        fused_leaky_relu=fused_leaky_relu,
        FusedLeakyReLU=FusedLeakyReLU,
    )


def load_reference():
    """Import and return the reference ``sgmse`` package (CPU-only)."""
    if "sgmse" in sys.modules:
        import sgmse  # already loaded

        return sgmse
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_third_party_stubs()
    _install_op_stub()
    import sgmse
    import sgmse.backbones  # noqa: F401

    return sgmse


def load_reference_model_module():
    """Import sgmse.model (needs the pl/torch_ema/wandb stubs)."""
    load_reference()
    import sgmse.model as ref_model

    return ref_model
