"""Training CLI for storm_tpu.

Same flag surface as the reference train.py (modes, backbones, SDE, data
args — reference train.py:27-158), TPU-native execution:

- one jitted train step (loss + grad + Adam + EMA) per iteration,
- batched STFT/compression on device (the reference does per-item CPU STFT
  in DataLoader workers),
- data parallelism over all visible devices via `jax.sharding.Mesh`
  (replacing Lightning DDP/NCCL): batch sharded on the 'data' axis, params
  replicated; XLA inserts the gradient all-reduce.
- early stopping on valid_loss (patience 50), checkpoints for last /
  best-loss / best-PESQ (reference train.py:139-145), TensorBoard +
  metrics.jsonl logging.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np






class _DedupGroup:
    """Ignore duplicate option strings when two chosen backbones contribute
    the same flag (e.g. --causal from both convtasnet and gagnet — the
    reference would crash on this combination; here the first group wins
    and the value is applied to both nets)."""

    def __init__(self, group):
        self._group = group

    def add_argument(self, *a, **kw):
        try:
            return self._group.add_argument(*a, **kw)
        except argparse.ArgumentError:
            # surface silently-divergent duplicates: if the winning group
            # registered this flag with different arity/type, the CLI
            # syntax would depend on backbone registration order
            import sys

            existing = getattr(
                self._group, "_option_string_actions", {})
            want_nargs = (0 if kw.get("action") in
                          ("store_true", "store_false")
                          else kw.get("nargs"))

            def tname(t):
                return getattr(t, "__name__", None) if t else None

            for opt in a:
                act = existing.get(opt) if isinstance(opt, str) else None
                if act is not None and (
                    act.nargs != want_nargs
                    or tname(act.type) != tname(kw.get("type"))
                ):
                    print(
                        f"warning: duplicate flag {opt} skipped with a "
                        "different arity/type than its first "
                        "registration — normalize the spellings in the "
                        "backbones' add_argparse_args",
                        file=sys.stderr,
                    )
            return None


def parse_args():
    # throwaway pre-parse picks the backbones so their argparse groups can
    # be attached dynamically (reference train.py:29-82 contract: the
    # chosen classes contribute their own flags)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--backbone_denoiser", type=str, default="ncsnpp")
    pre.add_argument("--backbone_score", type=str, default="ncsnpp")
    pre_args, _ = pre.parse_known_args()

    parser = argparse.ArgumentParser()
    # --- top-level (reference train.py:29-48) ---
    parser.add_argument("--mode", required=True, choices=[
        "score-only", "denoiser-only", "regen-freeze-denoiser",
        "regen-joint-training", "distill"])
    # --- distillation (beyond-reference, models/distill.py) ---
    parser.add_argument("--teacher_ckpt", default=None,
                        help="converged storm checkpoint to distill "
                        "(required with --mode distill); the student "
                        "inherits its full architecture and initializes "
                        "from its EMA weights")
    parser.add_argument("--distill_N", type=int, default=8,
                        help="teacher probability-flow ODE steps per "
                        "distillation target")
    parser.add_argument("--distill_method", default="etd2",
                        choices=("euler", "heun", "rk4", "etd1", "etd2"),
                        help="teacher ODE integrator for the targets")
    parser.add_argument("--distill_gt_weight", type=float, default=0.0,
                        help="optional auxiliary clean-target MSE weight "
                        "on top of the pure teacher-matching loss")
    parser.add_argument("--backbone_denoiser", type=str, default="ncsnpp")
    parser.add_argument("--pretrained_denoiser", default=None,
                        help="checkpoint dir for denoiser grafting")
    parser.add_argument("--backbone_score", type=str, default="ncsnpp")
    parser.add_argument("--pretrained_score", default=None,
                        help="checkpoint dir for score grafting")
    parser.add_argument("--sde", type=str, default="ouve",
                        choices=["ouve", "ouvp"])
    parser.add_argument("--nolog", action="store_true")
    parser.add_argument("--resume_from_checkpoint", default=None)

    # --- model (sgmse/model.py:452-463) ---
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ema_decay", type=float, default=0.999)
    parser.add_argument("--t_eps", type=float, default=0.03)
    parser.add_argument("--num_eval_files", type=int, default=10)
    parser.add_argument("--loss_type", type=str, default="mse",
                        choices=("mse", "mae", "sisdr"))
    parser.add_argument("--loss_type_denoiser", type=str, default="mse",
                        choices=("none", "mse", "mae"))
    parser.add_argument("--loss_type_score", type=str, default="mse",
                        choices=("none", "mse", "mae"))
    parser.add_argument("--weighting_denoiser_to_score", type=float, default=0.5)
    parser.add_argument("--condition", default="both",
                        choices=["noisy", "post_denoiser", "both"])
    parser.add_argument("--spatial_channels", type=int, default=1)

    # --- SDE (sgmse/sdes.py:242-252, 313-327) ---
    parser.add_argument("--sde-n", dest="sde_n", type=int, default=1000)
    parser.add_argument("--theta", type=float, default=1.5)
    parser.add_argument("--sigma-min", dest="sigma_min", type=float, default=0.05)
    parser.add_argument("--sigma-max", dest="sigma_max", type=float, default=0.5)
    parser.add_argument("--beta-min", dest="beta_min", type=float, default=0.1)
    parser.add_argument("--beta-max", dest="beta_max", type=float, default=1.0)
    parser.add_argument("--stiffness", type=float, default=1.0)

    # --- data module (sgmse/data_module.py:225-244) ---
    parser.add_argument("--format", type=str, default="wsj0", choices=[
        "wsj0", "vctk", "dns", "reverb_wsj0", "timit", "voicebank"])
    parser.add_argument("--base_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--n_fft", type=int, default=510)
    parser.add_argument("--hop_length", type=int, default=128)
    parser.add_argument("--num_frames", type=int, default=256)
    parser.add_argument("--window", type=str, choices=("sqrthann", "hann"),
                        default="hann")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--dummy", action="store_true")
    parser.add_argument("--spec_factor", type=float, default=0.33)
    parser.add_argument("--spec_abs_exponent", type=float, default=0.5)
    parser.add_argument("--return_time", action="store_true")

    # --- trainer ---
    parser.add_argument("--max_epochs", type=int, default=1000)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after this many optimizer steps (smoke)")
    parser.add_argument("--patience", type=int, default=50,
                        help="early-stopping patience on valid_loss")
    parser.add_argument("--log_dir", type=str, default="./.logs")
    parser.add_argument("--log_every_n_steps", type=int, default=10)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument("--nf", type=int, default=None,
                        help="override backbone base width (smoke tests)")
    parser.add_argument("--ch_mult", type=str, default=None,
                        help="override backbone channel multipliers, e.g. 1,2,2,2")
    parser.add_argument("--eval_N", type=int, default=None,
                        help="reverse steps for in-training eval (default: model default)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the reference keeps "
                        "torch detect_anomaly always on, model.py:22 — "
                        "here it is opt-in)")

    # --- dynamic backbone groups (reference train.py:58-82) ---
    from storm_tpu.backbones import BackboneRegistry

    backbone_keys = []
    seen = set()
    for name in (pre_args.backbone_denoiser, pre_args.backbone_score):
        try:
            cls = BackboneRegistry.get_by_name(name)
        except Exception:
            continue  # the main parser reports the bad name with choices
        add = getattr(cls, "add_argparse_args", None)
        if add is None or cls in seen:
            continue
        seen.add(cls)
        before = {a.dest for a in parser._actions}
        add(_DedupGroup(parser.add_argument_group(f"{name} backbone")))
        backbone_keys += [a.dest for a in parser._actions
                          if a.dest not in before]

    args = parser.parse_args()
    args.backbone_config_keys = backbone_keys
    return args


MODEL_CONFIG_KEYS = [
    "mode", "backbone_denoiser", "backbone_score", "sde", "lr", "ema_decay",
    "t_eps", "loss_type", "loss_type_denoiser", "loss_type_score",
    "weighting_denoiser_to_score", "condition", "spatial_channels",
    "sde_n", "theta", "sigma_min", "sigma_max", "beta_min", "beta_max",
    "stiffness", "n_fft", "hop_length", "window", "spec_factor",
    "spec_abs_exponent", "dtype",
]


def main():
    args = parse_args()
    import jax

    # the sitecustomize preload latches the platform into jax.config, so an
    # env var alone cannot move this CLI off the TPU (used by CI/tests)
    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])

    # --- multi-host data parallelism (reference train.py:150: Lightning
    # DDP is multi-process/multi-node; this is the jax.distributed
    # equivalent). Set STORM_TPU_COORDINATOR=host:port plus
    # STORM_TPU_NUM_PROCESSES / STORM_TPU_PROCESS_ID on every process, or
    # rely on JAX's own cluster auto-detection env vars.
    if os.environ.get("STORM_TPU_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["STORM_TPU_COORDINATOR"],
            num_processes=int(os.environ["STORM_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["STORM_TPU_PROCESS_ID"]),
        )
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    def mh_barrier(name: str, timeout_min: int = 120):
        """Multi-host rendezvous via the coordination service (NOT a device
        collective): XLA's CPU Gloo collectives time out after ~30 s, so a
        rank doing rank-0-only work (eval, checkpoint I/O) for longer than
        that would kill every peer waiting in the next psum. This barrier
        waits minutes-to-hours without touching the collective path."""
        if n_proc > 1:
            from jax._src import distributed as _dist

            _dist.global_state.client.wait_at_barrier(
                name, timeout_in_ms=timeout_min * 60 * 1000)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if n_proc == 1:
        # persistent compile cache keys include the (per-process) device
        # topology: in a multi-process run one rank can hit a warm entry
        # while a peer compiles cold for minutes, and the warm rank then
        # dies in the first collective's ~30 s Gloo timeout. Cold-compiling
        # every rank keeps their arrival skew at seconds.
        from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
        enable_jax_compilation_cache()
    from storm_tpu.ckpt import (AsyncCheckpointManager, CheckpointManager,
                                load_checkpoint, load_meta)
    from storm_tpu.data import SpecsDataModule
    from storm_tpu.models import StochasticRegenerationModel, wav_to_spec
    from storm_tpu.models.factory import build_model
    from storm_tpu.utils.inference import evaluate_model

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    teacher_state = None
    if args.mode == "distill":
        # the student IS the teacher's architecture: every model/signal
        # config field comes from the teacher checkpoint; only the
        # optimizer and distillation knobs are this run's
        if not args.teacher_ckpt:
            raise SystemExit("--mode distill requires --teacher_ckpt")
        t_config, teacher_state = load_checkpoint(args.teacher_ckpt)
        if t_config.get("mode") not in (
            "regen-joint-training", "regen-freeze-denoiser"
        ):
            raise SystemExit(
                "--teacher_ckpt must be a storm (regen-*) checkpoint, got "
                f"mode={t_config.get('mode')!r}"
            )
        config = dict(t_config)
        config.update(
            mode="distill", lr=args.lr, ema_decay=args.ema_decay,
            distill_N=args.distill_N, distill_method=args.distill_method,
            distill_gt_weight=args.distill_gt_weight,
        )
        # keep the data pipeline and run naming consistent with the
        # teacher's signal/architecture config
        for k in ("n_fft", "hop_length", "window", "spec_factor",
                  "spec_abs_exponent", "backbone_denoiser",
                  "backbone_score", "condition", "spatial_channels", "sde"):
            if k in config:
                setattr(args, k, config[k])
        model = build_model(dict(config)).with_teacher(
            jax.device_get(teacher_state.ema_params["score"])
        )
        print(f"distilling teacher {args.teacher_ckpt} "
              f"(N={args.distill_N} {args.distill_method} targets)")
    else:
        config = {k: getattr(args, k) for k in MODEL_CONFIG_KEYS}
        # flags contributed by the chosen backbones' argparse groups
        for k in getattr(args, "backbone_config_keys", []):
            config[k] = getattr(args, k)
        if args.nf is not None:
            config["nf"] = args.nf
        if args.ch_mult is not None:
            config["ch_mult"] = tuple(int(c) for c in args.ch_mult.split(","))
        if args.sde == "ouve":
            for k in ("beta_min", "beta_max", "stiffness"):
                config.pop(k)
        else:
            for k in ("theta", "sigma_min", "sigma_max"):
                config.pop(k)
        model = build_model(dict(config))

    if args.return_time and (
        args.mode != "denoiser-only"
        or not getattr(model.dnn, "FORCE_STFT_OUT", False)
        or args.spatial_channels != 1
    ):
        # checked before any expensive init; see the return_time prepare
        # path below for semantics
        raise SystemExit(
            "--return_time requires --mode denoiser-only with a "
            "mono time-domain backbone (convtasnet)"
        )

    # --- data ------------------------------------------------------------
    dm = SpecsDataModule(
        base_dir=args.base_dir, format=args.format,
        spatial_channels=args.spatial_channels, batch_size=args.batch_size,
        n_fft=args.n_fft, hop_length=args.hop_length,
        num_frames=args.num_frames, window=args.window,
        num_workers=args.num_workers, dummy=args.dummy,
        spec_factor=args.spec_factor,
        spec_abs_exponent=args.spec_abs_exponent,
        return_time=args.return_time, seed=args.seed,
        shard=(jax.process_index(), n_proc),
    )
    dm.setup("fit")
    if is_main:
        print(f"train files: {len(dm.train_set)}, "
              f"valid files: {len(dm.valid_set)}")

    # --- state / sharding -------------------------------------------------
    n_dev = len(jax.devices())
    if args.batch_size % n_dev:
        raise SystemExit(
            f"--batch_size {args.batch_size} not divisible by {n_dev} devices"
        )
    mesh = Mesh(np.array(jax.devices()), ("data",))
    data_sharding = NamedSharding(mesh, P("data"))
    repl_sharding = NamedSharding(mesh, P())

    def put_global(tree, sharding):
        """Host data -> global jax.Array under `sharding`. Single-process:
        plain device_put. Multi-process: every process contributes its
        local shard (batch rows for data_sharding, the full — identical —
        value for repl_sharding)."""
        if n_proc == 1:
            return jax.device_put(tree, sharding)
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.asarray(a)),
            tree,
        )

    num_frames = args.num_frames
    spec_shape = (args.batch_size, args.n_fft // 2 + 1, num_frames)
    state = model.init_state(jax.random.PRNGKey(args.seed), spec_shape)
    if teacher_state is not None:
        # student starts AT the teacher (its one-step map is then exactly
        # the posterior-mean estimate, models/distill.py); the denoiser is
        # carried along frozen (zero gradients) so the distilled checkpoint
        # serves standalone
        tp = jax.device_get(
            {"denoiser": teacher_state.ema_params["denoiser"],
             "score": teacher_state.ema_params["score"]}
        )
        state = state.replace(params=tp, ema_params=tp)

    start_epoch = 0
    resumed_meta = None
    if args.resume_from_checkpoint:
        _, state = load_checkpoint(args.resume_from_checkpoint, target=state)
        resumed_meta = load_meta(args.resume_from_checkpoint)
        if resumed_meta and resumed_meta.get("epoch") is not None:
            start_epoch = int(resumed_meta["epoch"]) + 1
        print(
            f"resumed from {args.resume_from_checkpoint} at step "
            f"{int(state.step)}, epoch {start_epoch}"
            + ("" if resumed_meta else " (no meta.json: loop state reset)")
        )

    # component grafting (reference train.py:100-103, model.py:496-503)
    if args.pretrained_denoiser:
        assert isinstance(model, StochasticRegenerationModel)
        _, d_state = load_checkpoint(args.pretrained_denoiser)
        params = dict(state.params)
        params["denoiser"] = (
            d_state.params["denoiser"]
            if "denoiser" in d_state.params else d_state.params
        )
        state = state.replace(params=params,
                              ema_params={**state.ema_params,
                                          "denoiser": params["denoiser"]})
        print(f"grafted pretrained denoiser from {args.pretrained_denoiser}")
    if args.pretrained_score:
        assert isinstance(model, StochasticRegenerationModel)
        _, s_state = load_checkpoint(args.pretrained_score)
        params = dict(state.params)
        params["score"] = (
            s_state.params["score"]
            if "score" in s_state.params else s_state.params
        )
        state = state.replace(params=params,
                              ema_params={**state.ema_params,
                                          "score": params["score"]})
        print(f"grafted pretrained score model from {args.pretrained_score}")

    state = put_global(state, repl_sharding)

    # --- compiled programs -------------------------------------------------
    # donate=True: the previous step's params/opt-state buffers are reused
    # in place on the hot path (checkpointing does jax.device_get copies)
    # fold_step_rng: per-step RNG derived on device from state.step — no
    # per-step host split/dispatch (measured ~12 ms/step over the tunnel)
    train_step = model.make_train_step(donate=True, fold_step_rng=True)
    if args.return_time:
        # pure time-domain training (reference data_module.py:116-124 +
        # sgmse/model.py:344-347): the batch stays as waveforms and the
        # FORCE_STFT_OUT backbone consumes/emits time signals directly —
        # the canonical ConvTasNet + SI-SDR recipe, with no STFT round-trip
        # on the loss path. Only meaningful for denoiser-only time-domain
        # backbones (the reference's score-mode return_time path would feed
        # waveforms into spectral marginal_prob and is untrained/untested
        # upstream; see docs/PARITY.md).
        prepare = jax.jit(
            lambda b: (b[0].reshape(b[0].shape[0], -1),
                       b[1].reshape(b[1].shape[0], -1))
        )
    else:
        prepare = jax.jit(
            lambda b: (
                wav_to_spec(b[0], model.stft_config, model.transform),
                wav_to_spec(b[1], model.stft_config, model.transform),
            )
        )
    # per-example valid losses so ragged tail batches can be padded + masked
    # (the reference evaluates every file; a skip would bias the early-stop
    # signal by up to batch_size-1 files)
    # masked on-device reduction to (sum, count) scalars: the mask zeroes
    # pad rows by GLOBAL row index, so the value is identical for any
    # process count, and only two replicated scalars cross the jit
    # boundary (multi-host-safe: no per-example host gather needed)
    valid_masked_fn = jax.jit(
        lambda params, key, batch, mask: (
            jnp.sum(
                model.loss_per_example(params, key, batch, False) * mask
            ),
            jnp.sum(mask),
        )
    )

    # --- logging ----------------------------------------------------------
    sde_name = {"ouve": "OUVESDE", "ouvp": "OUVPSDE"}[args.sde]
    run_name = (
        f"mode={args.mode}_sde={sde_name}_score={args.backbone_score}"
        f"_denoiser={args.backbone_denoiser}_condition={args.condition}"
        f"_data={args.format}_ch={args.spatial_channels}"
    )
    log_dir = os.path.join(args.log_dir, run_name)
    writer = None
    metrics_file = None
    ckpt_mgr = None
    # logging/checkpointing are process-0-only under multi-host (Lightning
    # rank-zero semantics); params are replicated so process 0 holds the
    # complete state
    if not args.nolog and is_main:
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(log_dir)
        except ImportError:
            writer = None
        metrics_file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        # async: device-side snapshot now, device->host pull + orbax write
        # overlapped with the next epoch (storm_tpu/ckpt.py)
        ckpt_mgr = AsyncCheckpointManager(
            CheckpointManager(os.path.join(log_dir, "checkpoints"), config))
        print(f"logging to {log_dir}")

    def log(step, **metrics):
        if writer is not None:
            for k, v in metrics.items():
                if np.isfinite(v):
                    writer.add_scalar(k, v, step)
        if metrics_file is not None:
            metrics_file.write(json.dumps({"step": step, **metrics}) + "\n")
            metrics_file.flush()

    # --- training loop -----------------------------------------------------
    best_valid = float("inf")
    bad_epochs = 0
    if resumed_meta:
        # restore early-stop / best-checkpoint loop state (Lightning resume
        # restores callback state, reference README.md:22, train.py:139-145)
        if resumed_meta.get("best_valid") is not None:
            best_valid = float(resumed_meta["best_valid"])
        if resumed_meta.get("bad_epochs") is not None:
            bad_epochs = int(resumed_meta["bad_epochs"])
        if ckpt_mgr is not None:
            ckpt_mgr.restore_from_meta(resumed_meta)
    global_step = int(state.step)
    t_start = time.time()

    # align ranks after per-process setup (data scan, resume restore) so
    # the first compiled step's collective rendezvous only sees compile
    # skew, not setup skew
    mh_barrier("storm_setup")

    for epoch in range(start_epoch, args.max_epochs):
        # epoch-deterministic RNG + shuffle order: a resumed run replays
        # exactly the stream a continuous run would have used (the per-step
        # key is fold_in(epoch_key, state.step) ON DEVICE — fold_step_rng)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        epoch_key = put_global(key, repl_sharding)
        dm.train_dataloader().set_epoch(epoch)
        epoch_losses = []
        for batch in dm.train_dataloader():
            device_batch = put_global(
                (np.asarray(batch[0]), np.asarray(batch[1])), data_sharding
            )
            spec_batch = prepare(device_batch)
            state, aux = train_step(state, spec_batch, epoch_key)
            global_step += 1
            if global_step % args.log_every_n_steps == 0:
                log(global_step, **{f"train_{k_}": float(v)
                                    for k_, v in aux.items()})
            epoch_losses.append(aux["loss"])
            if args.max_steps and global_step >= args.max_steps:
                break

        train_loss = float(np.mean([float(l) for l in epoch_losses]))

        # validation loss over EVERY file: ragged tail batches are padded to
        # the static jit shape and masked out of the average
        vloss_sum, vloss_count = 0.0, 0
        B_loc = args.batch_size // n_proc
        row_lo = jax.process_index() * B_loc
        n_valid = len(dm.valid_set)
        for bi, batch in enumerate(dm.val_dataloader()):
            rows_global = min(args.batch_size, n_valid - bi * args.batch_size)
            bx, by = np.asarray(batch[0]), np.asarray(batch[1])
            if bx.shape[0] < B_loc:  # single-process ragged tail
                pad = [(0, B_loc - bx.shape[0])] + [(0, 0)] * (bx.ndim - 1)
                bx, by = np.pad(bx, pad), np.pad(by, pad)
            mask_loc = (
                (row_lo + np.arange(B_loc)) < rows_global
            ).astype(np.float32)
            key, k = jax.random.split(key)
            device_batch = put_global((bx, by), data_sharding)
            # validation runs with EMA (shadow) params like the reference's
            # eval-mode EMA swap (sgmse/model.py:97-111)
            s, c = valid_masked_fn(
                state.ema_params, put_global(np.asarray(k), repl_sharding),
                prepare(device_batch), put_global(mask_loc, data_sharding),
            )
            vloss_sum += float(s)
            vloss_count += int(c)
        if vloss_count:
            valid_loss = vloss_sum / vloss_count
            if getattr(model, "batch_reduction", "mean") == "sum":
                # keep the scale of the model's own batch reduction (StoRM
                # sums over the batch axis, sgmse/model.py:449)
                valid_loss *= args.batch_size
        else:
            valid_loss = float("nan")

        # enhancement metrics on EMA params (reference model.py:605-622);
        # audio + spectrogram artifacts every VIS_EPOCHS (model.py:20,
        # 624-641)
        VIS_EPOCHS = 5
        visualize = writer is not None and epoch % VIS_EPOCHS == 0
        pesq_est = si_sdr_est = estoi_est = float("nan")
        if args.num_eval_files and is_main:
            ek = {"N": args.eval_N} if args.eval_N else {}
            try:
                pesq_est, si_sdr_est, estoi_est, spec, audio = evaluate_model(
                    model, jax.device_get(state.ema_params), dm.valid_set,
                    args.num_eval_files, spec=visualize, audio=visualize, **ek,
                )
                print(f"PESQ at epoch {epoch} : {pesq_est:.2f}")
                print(f"SISDR at epoch {epoch} : {si_sdr_est:.1f}")
                print(f"ESTOI at epoch {epoch} : {estoi_est:.2f}")
                if visualize and audio is not None:
                    for idx, (yv, xh, xv) in enumerate(zip(*audio)):
                        if epoch == 0:
                            writer.add_audio(
                                f"Epoch={epoch} Mix/{idx}",
                                yv / (np.abs(yv).max() + 1e-9), epoch, 16000)
                            writer.add_audio(
                                f"Epoch={epoch} Clean/{idx}",
                                xv / (np.abs(xv).max() + 1e-9), epoch, 16000)
                        writer.add_audio(
                            f"Epoch={epoch} Estimate/{idx}",
                            xh / (np.abs(xh).max() + 1e-9), epoch, 16000)
                if visualize and spec is not None:
                    from storm_tpu.utils.graphics import visualize_example

                    for idx, (ys, xs_, cs) in enumerate(zip(*spec)):
                        fig = visualize_example(ys, xs_, cs, return_fig=True)
                        writer.add_figure(f"Epoch={epoch}/Spec/{idx}", fig)
            except Exception as e:  # eval must not kill training
                print(f"eval failed at epoch {epoch}: {e}")

        elapsed = time.time() - t_start
        if is_main:
            print(
                f"epoch {epoch}: train_loss={train_loss:.4f} "
                f"valid_loss={valid_loss:.4f} step={global_step} "
                f"({elapsed:.0f}s)"
            )
        log(global_step, train_loss_epoch=train_loss, valid_loss=valid_loss,
            ValidationPESQ=pesq_est, ValidationSISDR=si_sdr_est,
            ValidationESTOI=estoi_est)

        # early stopping (reference train.py:139) — updated before the
        # checkpoint save so meta.json reflects post-epoch loop state
        if valid_loss < best_valid:
            best_valid = valid_loss
            bad_epochs = 0
        else:
            bad_epochs += 1

        if ckpt_mgr is not None:
            ckpt_mgr.step_async(state, valid_loss=valid_loss,
                                pesq=pesq_est, estoi=estoi_est, epoch=epoch,
                                bad_epochs=bad_epochs, best_valid=best_valid)

        # rank 0 just spent unbounded wall time in eval/logging/checkpoint
        # dispatch; re-align before the next epoch's first collective
        mh_barrier(f"storm_epoch_{epoch}")

        if bad_epochs >= args.patience:
            print(f"early stopping at epoch {epoch}")
            break
        if args.max_steps and global_step >= args.max_steps:
            break

    if ckpt_mgr is not None:
        ckpt_mgr.wait()
    if metrics_file is not None:
        metrics_file.close()
    if n_proc > 1:
        # align exits: a process leaving while a peer still polls the
        # coordination service turns a clean finish into an RPC error.
        # Coordination-service barrier, not a device collective — rank 0
        # may still be finishing checkpoint I/O well past the ~30 s Gloo
        # collective timeout.
        mh_barrier("storm_tpu_train_done")
        jax.distributed.shutdown()
    if is_main:
        print("training done.")


if __name__ == "__main__":
    main()
