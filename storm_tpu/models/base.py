"""Model-layer foundations: train state, EMA, optimizer, spec<->wav plumbing.

Functional JAX re-design of the reference Lightning-module layer
(sgmse/model.py). Instead of stateful modules, each model is a static config
object whose methods return pure functions over an explicit `TrainState`
pytree; `train_step` is one jitted program (loss + grads + Adam + EMA), and
`enhance` is one jitted program (STFT -> denoiser -> scan sampler -> iSTFT).

EMA matches torch-ema semantics (used at sgmse/model.py:55, 80-83): shadow
parameters updated after every optimizer step with warmup
`decay_t = min(decay, (1+n)/(10+n))`, and evaluation runs with the shadow
(EMA) parameters swapped in — here simply `state.ema_params`.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..signal.stft import STFTConfig, istft_real, stft_real
from ..signal.transforms import SpecTransform, pad_spec


@flax.struct.dataclass
class TrainState:
    """Replicated training state: {params, ema_params, opt_state, step}."""

    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def ema_update(ema_params, params, decay: float, step):
    """torch-ema shadow update with warmup (`use_num_updates=True`)."""
    num = step.astype(jnp.float32)
    decay_t = jnp.minimum(decay, (1.0 + num) / (10.0 + num))
    return jax.tree.map(
        lambda e, p: decay_t * e + (1.0 - decay_t) * p, ema_params, params
    )


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with the reference defaults (sgmse/model.py:77-79: lr only)."""
    return optax.adam(lr)


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
    )


# ---------------------------------------------------------------------------
# Shared wav <-> compressed-spec plumbing (device-side, jit-safe)
# ---------------------------------------------------------------------------

def wav_to_spec(y, stft_config: STFTConfig, transform: SpecTransform):
    """(B, T) waveform -> compressed packed-real spec (B, F, Tf, 2)."""
    return transform.forward_packed(stft_real(y, stft_config))


def spec_to_wav(spec, stft_config: STFTConfig, transform: SpecTransform,
                length: Optional[int] = None):
    """Compressed packed-real spec (B, F, Tf, 2) -> (B, T) waveform.

    Mirrors `to_audio = istft(spec_back(.))` (sgmse/model.py:259-260)."""
    return istft_real(transform.backward_packed(spec), stft_config, length=length)


def normalize_wav(y):
    """Per-utterance max-abs normalization (sgmse/model.py:730-731).

    Reduces over everything but the batch axis, so multichannel (B, D, T)
    utterances share one norm factor across channels (the reference's
    `y.abs().max()` is a global max per utterance).

    Returns (y_normalized, norm_factor) broadcastable against y.
    """
    B = y.shape[0]
    norm = jnp.max(jnp.abs(y).reshape(B, -1), axis=-1)
    norm = jnp.maximum(norm, 1e-10).reshape((B,) + (1,) * (y.ndim - 1))
    return y / norm, norm


def lift_spec(Y):
    """Lift a spec to the canonical multichannel shape.

    (B, F, T, 2) -> ((B, 1, F, T, 2), True); (B, D, F, T, 2) unchanged
    -> (Y, False). The flag tells the caller to squeeze outputs back.
    """
    if Y.ndim == 4:
        return Y[:, None], True
    if Y.ndim == 5:
        return Y, False
    raise ValueError(f"expected (B,F,T,2) or (B,D,F,T,2) spec, got {Y.shape}")


def make_deepcache_fns(net, get_variables, pack_input, cache_depth: int):
    """Build the (deep_fn, cached_score_fn) pair `pc_sample(deepcache=K)`
    consumes — the ONE place encoding the cached score evaluation's
    contract (input packing, variables dict, `-out` sign, squeeze), shared
    by ScoreModel and StochasticRegenerationModel so the
    deepcache==exact-trajectory invariant cannot drift per model class.

    Args:
        net: NCSN++-family flax module (must expose deep_features /
            forward_shallow and set SUPPORTS_DEEPCACHE).
        get_variables: () -> flax variables dict ({"params", "quant"?,
            "batch_stats"?}).
        pack_input: x -> (dnn_input, squeezed) — the model's score-input
            concat (x plus closed-over conditioning).
    """

    def deep_fn(x, t):
        dnn_input, _ = pack_input(x)
        return net.apply(
            get_variables(), dnn_input, t,
            method="deep_features", cache_depth=cache_depth,
        )

    def cached_score_fn(x, t, cache):
        dnn_input, squeezed = pack_input(x)
        out = net.apply(
            get_variables(), dnn_input, t,
            method="forward_shallow", cache=cache, cache_depth=cache_depth,
        )
        return -(out[:, 0] if squeezed else out)

    return deep_fn, cached_score_fn


def check_deepcache_config(net, deepcache: int, sampler_type: str):
    """Validate a make_enhance deepcache request with clear errors."""
    if deepcache < 0:
        raise ValueError(f"deepcache must be >= 0, got {deepcache}")
    if sampler_type not in ("pc", "ode"):
        raise ValueError(
            "deepcache requires the pc or ode sampler (picard folds time "
            "into the batch axis — an N-point per-step cache would defeat "
            f"the memory saving); got {sampler_type!r}"
        )
    if net is not None and not getattr(net, "SUPPORTS_DEEPCACHE", False):
        raise ValueError(
            "deepcache requires an NCSN++-family (2-D U-Net) backbone; "
            f"{type(net).__name__} does not support the cache split"
        )


def spec_sharding_constraint(mesh, mesh_axes=("data", "seq")):
    """Build a sharding-constraint closure for compressed specs.

    Returns `constrain(Z)` placing a spec's batch axis on `mesh_axes[0]`
    and its time-frame axis (-2, see prepare_spec) on `mesh_axes[1]` of
    `mesh`. Applied to the spectrogram and to every sampler-step network
    input, this makes XLA's SPMD partitioner keep the whole reverse
    diffusion spatially sharded over the mesh — GSPMD inserts the halo
    exchanges the 3x3 convs need and runs norm/attention reductions as
    collectives over ICI. This is the model-parallel serving axis
    (single-utterance latency scales with chip count); the reference has
    no equivalent (its DDP, train.py:150, is data-parallel training only).

    `mesh=None` returns the identity, so call sites can apply it
    unconditionally.
    """
    if mesh is None:
        return lambda Z: Z
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_ax, seq_ax = mesh_axes

    def constrain(Z):
        # spec ranks: (B, F, T, 2) or (B, D, F, T, 2); T is axis -2
        spec = [data_ax] + [None] * (Z.ndim - 3) + [seq_ax, None]
        return jax.lax.with_sharding_constraint(
            Z, NamedSharding(mesh, P(*spec))
        )

    return constrain


def prepare_spec(y, stft_config: STFTConfig, transform: SpecTransform,
                 multiple: int = 64):
    """wav (B, T) -> (Y_padded, num_frames_orig): compressed spec with the
    time-frame axis zero-padded to a multiple of 64 (sgmse/model.py:732-733;
    util/other.py:102-109)."""
    Y = wav_to_spec(y, stft_config, transform)
    t_orig = Y.shape[-2]
    return pad_spec(Y, multiple=multiple, axis=-2), t_orig


def time_domain_denoise(dnn, params, Y, stft_config: STFTConfig,
                        transform: SpecTransform):
    """Run a FORCE_STFT_OUT (time-domain) backbone on a compressed spec.

    spec -> wav -> dnn -> wav -> spec, keeping the frame count of Y
    (the reference converts around such backbones at
    sgmse/model.py:322-324, 362-363).
    """
    t_frames = Y.shape[-2]
    length = (t_frames - 1) * stft_config.hop_length
    y_time = spec_to_wav(Y, stft_config, transform, length=length)
    out_time = dnn.apply({"params": params}, y_time)
    out_spec = wav_to_spec(out_time, stft_config, transform)
    # stft of exactly (t-1)*hop samples gives t frames; guard regardless
    return out_spec[..., :t_frames, :]
