"""The training runtime — the layer the reference outsources to
PyTorch Lightning (SURVEY.md §1 L4) rebuilt TPU-native.

Responsibilities (reference features in parentheses):
  * jitted data-parallel train/eval steps over a device mesh
    (PL ``accelerator='dp'`` replicate/scatter/gather -> GSPMD psum)
  * Adam + staircase step decay, applied per-step
    (torch Adam + StepLR(10000, 0.9) with interval="step",
    neural_waveshaping.py:92-102)
  * global-norm gradient clipping at 2.0 (PL gradient_clip_val,
    gin/train/train_newt.gin:12)
  * best-on-val + last checkpointing with auto-resume (PL
    ModelCheckpoint(monitor="val/loss", save_top_k=1, save_last),
    scripts/train.py:58-60,74)
  * metric logging: train/loss, val/loss, test/loss epoch aggregates
    (sync_dist=True -> the psum'd loss is already globally reduced)

Design: the step functions are pure (state, batch, key) -> (state,
metrics), jit-compiled once with donated state; the Trainer object only
orchestrates host-side concerns (data, checkpoints, logging).
"""
import contextlib
import dataclasses
import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import minigin as gin
from ..models.neural_waveshaping import NeuralWaveshaping
from ..parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from .loss import multi_resolution_stft_loss


@gin.configurable
@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    lr_decay: float = 0.9
    lr_decay_interval: int = 10000
    max_steps: int = 120000
    gradient_clip_val: float = 2.0
    data_parallel: bool = True
    val_every_n_steps: int = 1000
    log_every_n_steps: int = 100
    checkpoint_dir: str = "checkpoints_tpu"
    keep_n_checkpoints: int = 2
    seed: int = 0
    # torch.optim.Adam default (the reference recipe trains with it,
    # reference models/neural_waveshaping.py:95); exposed as a normal
    # optimizer knob. Note eps also sets the early-training noise
    # amplification (update ~ g/(sqrt(nu)+eps) with nu ~ 0 at step 0),
    # which is why cross-mesh trajectory tests gate post-chaos-horizon
    # values statistically (tests/test_training.py
    # _assert_same_trajectory).
    adam_eps: float = 1e-8
    # Lazy-path wire format: ship chunk AUDIO host->device as int16
    # (dequantized to f32 on device, inside the jitted chunk program) —
    # audio is ~98% of the chunk bytes and int16 quarters them. On THIS
    # tunneled runtime it buys nothing measurable (8.8 vs 8.7 steps/s,
    # scripts/bench_data_path.py 2026-08-18: the lazy gap there is
    # fixed per-call overhead, not bandwidth — DESIGN §2); kept as a
    # tested opt-in for bandwidth-bound links. Opt-in also because it
    # quantizes the loss target to 16 bits (~3e-5 — source-WAV
    # fidelity, but eager/lazy equivalence is only bit-exact with it
    # off).
    lazy_int16_wire: bool = False


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """StepLR parity: lr * decay^(step // interval), staircase."""
    return optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.lr_decay_interval,
        decay_rate=cfg.lr_decay,
        staircase=True,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm then Adam — PL clips before the optimizer
    step, exactly this order."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adam(make_lr_schedule(cfg), eps=cfg.adam_eps),
    )


def init_train_state(
    model: NeuralWaveshaping, cfg: TrainConfig, key: jax.Array
) -> Dict:
    # jit the whole init: eagerly it dispatches ~60 individual RNG ops,
    # each a separate (slow, remote) backend compile on this platform.
    params = jax.jit(model.init)(key)
    opt_state = make_optimizer(cfg).init(params)
    return {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
        # running loss sum, accumulated ON DEVICE: per-buffer host
        # operations cost ~100s of ms on tunneled TPU runtimes, so the
        # trainer reads one scalar per log window and differences it
        # instead of holding per-step loss scalars. Default float dtype
        # (not pinned f32) so x64 equivalence tests keep a uniform
        # scan carry when the loss computes in f64.
        "loss_sum": jnp.zeros(()),
    }


def train_state_from_params(params: Dict, cfg: TrainConfig) -> Dict:
    """Wrap converted reference weights (fine-tune / resume-from-torch)."""
    return {
        "params": params,
        "opt_state": make_optimizer(cfg).init(params),
        "step": jnp.zeros((), jnp.int32),
        "loss_sum": jnp.zeros(()),
    }


def compute_loss(
    model: NeuralWaveshaping, params: Dict, batch: Dict, key: jax.Array
) -> jnp.ndarray:
    """One forward + multi-res STFT loss (reference _run_step :104-112)."""
    recon = model.apply(params, batch["f0"], batch["control"], key=key)
    return multi_resolution_stft_loss(recon, batch["audio"])


def make_train_step(
    model: NeuralWaveshaping, cfg: TrainConfig
) -> Callable[[Dict, Dict, jax.Array], Tuple[Dict, Dict]]:
    optimizer = make_optimizer(cfg)

    def train_step(state: Dict, batch: Dict, key: jax.Array):
        # Per-step randomness: fold the step count into the run key so
        # every step draws fresh oscillator phases / noise (the reference
        # draws fresh torch.rand per forward).
        step_key = jax.random.fold_in(key, state["step"])
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(model, p, batch, step_key)
        )(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "loss_sum": state["loss_sum"] + loss,
        }
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_batch_gather(mesh):
    """On-device batch assembly as its OWN tiny jitted program.

    Keeps the (small) training split device-resident; batches gather by
    an index vector. The gather must NOT be fused into the train-step
    program: on this TPU backend, row gathers embedded in large jit
    programs compile pathologically (>9 min observed), while the same
    gather standalone compiles in under a second.

    The index can be (B,) for one batch or (N*B,) for a whole chunk of
    N steps; outputs shard batch-wise on the data axis either way.
    """
    from ..parallel.mesh import batch_sharding, replicated_sharding

    rep = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    def gather(data: Dict, idx: jnp.ndarray) -> Dict:
        return {k: v[idx] for k, v in data.items()}

    return jax.jit(
        gather,
        in_shardings=(rep, rep),
        out_shardings={"audio": data_sh, "f0": data_sh, "control": data_sh},
    )


def make_multi_train_step(model: NeuralWaveshaping, cfg: TrainConfig):
    """N training steps as ONE jitted lax.scan over pre-gathered batches.

    On a tunneled TPU runtime every dispatch, buffer creation, and
    buffer free is a slow host round-trip (~100s of ms each); a
    per-step python loop therefore caps out at a few steps/s even
    though the step itself takes 0.5 ms of device time. Scanning N
    steps inside one program makes the whole chunk a single dispatch
    with a single (N,) loss output.

    Batches arrive with a leading scan axis: {audio: (N, B, Ta), ...}.
    """
    optimizer = make_optimizer(cfg)

    def one_step(state: Dict, batch: Dict, key: jax.Array):
        step_key = jax.random.fold_in(key, state["step"])
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(model, p, batch, step_key)
        )(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "loss_sum": state["loss_sum"] + loss,
        }, loss

    def multi_step(state: Dict, batches: Dict, key: jax.Array):
        def body(carry, batch):
            return one_step(carry, batch, key)

        state, losses = jax.lax.scan(body, state, batches)
        return state, losses  # (N,) device array — one buffer

    return multi_step


def _chunk_length(cfg: TrainConfig) -> int:
    """Steps fused into one scan dispatch: the largest divisor of the
    log/val cadence gcd not exceeding 128 (longer chunks pre-gather
    GB-scale batch buffers and have crashed the TPU worker; ~128 already
    amortizes host overhead below 3%). A divisor keeps log/val
    boundaries aligned with chunk boundaries."""
    import math

    chunk = math.gcd(cfg.log_every_n_steps, cfg.val_every_n_steps)
    if chunk > 128:
        chunk = max(d for d in range(1, 129) if chunk % d == 0)
    return chunk


def make_eval_step(model: NeuralWaveshaping):
    def eval_step(params: Dict, batch: Dict, key: jax.Array):
        recon = model.apply(params, batch["f0"], batch["control"], key=key)
        return multi_resolution_stft_loss(recon, batch["audio"]), recon

    return eval_step


def select_eval_step(directory: str, step: Optional[int] = None):
    """Open an orbax checkpoint directory for evaluation/export and pick
    the step to load: an explicit ``step`` wins; otherwise the
    best-on-val step recorded in the checkpoint metrics (the PL
    convention of evaluating best.ckpt, not last — the manager's
    ``latest_step`` is merely the highest-numbered retained save);
    otherwise the latest step. Returns ``(manager, step)``."""
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            best_fn=lambda m: m["val_loss"], best_mode="min"
        ),
    )
    if step is None:
        step = mngr.best_step()  # None when no metrics were recorded
    if step is None:
        step = mngr.latest_step()
    return mngr, step


class Trainer:
    """Host-side orchestration: jit-compile the steps onto a mesh, stream
    batches, checkpoint, log."""

    def __init__(
        self,
        model: NeuralWaveshaping,
        cfg: TrainConfig,
        mesh=None,
        loggers: Optional[list] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh()
        self.loggers = loggers or []
        # heartbeat for external hang watchdogs: TPU-worker crashes can
        # HANG the blocked RPC instead of raising, so exceptions alone
        # don't cover failure detection. Updated every completed chunk/
        # step and at every phase boundary.
        self.last_progress = time.time()

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        batch_shardings = {"audio": data, "f0": data, "control": data}

        self._train_step = jax.jit(
            make_train_step(model, cfg),
            in_shardings=(rep, batch_shardings, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._gather_batch = make_batch_gather(self.mesh)

        from jax.sharding import NamedSharding, PartitionSpec as P

        chunk_sharding = {
            k: NamedSharding(self.mesh, P(None, "data"))
            for k in ("audio", "f0", "control")
        }
        self._chunk_sharding = chunk_sharding
        self._gather_chunk = jax.jit(
            lambda data, idx: {k: v[idx] for k, v in data.items()},
            in_shardings=(rep, rep),
            out_shardings=chunk_sharding,
        )
        self._multi_step = jax.jit(
            make_multi_train_step(model, cfg),
            in_shardings=(rep, chunk_sharding, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        # int16-wire variant (TrainConfig.lazy_int16_wire): same chunk
        # program behind an on-device dequant of the audio leaf
        _multi = make_multi_train_step(model, cfg)

        def _multi_step_from_i16(state, batches, key):
            dec = dict(batches)
            dec["audio"] = batches["audio"].astype(jnp.float32) * (
                1.0 / 32767.0
            )
            return _multi(state, dec, key)

        self._multi_step_i16 = jax.jit(
            _multi_step_from_i16,
            in_shardings=(rep, chunk_sharding, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(model),
            in_shardings=(rep, batch_shardings, rep),
            out_shardings=(rep, rep),
        )

    # -- checkpointing -------------------------------------------------------
    def _ckpt_manager(self, directory: str):
        """Two orbax managers implementing the reference's PL policy
        (ModelCheckpoint(monitor="val/loss", save_top_k, save_last),
        /root/reference/scripts/train.py): the top-level directory keeps
        the ``keep_n_checkpoints`` best-on-val steps (what export/
        resynthesis CLIs open), and ``<dir>/last`` keeps exactly the
        newest step regardless of val loss — so a crash never loses more
        than one val interval of progress. Orbax ignores the non-numeric
        ``last`` subdir when scanning the top level for steps."""
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        best = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.cfg.keep_n_checkpoints,
                best_fn=lambda m: m["val_loss"],
                best_mode="min",
            ),
        )
        last = ocp.CheckpointManager(
            os.path.join(directory, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        return best, last

    def save_checkpoint(self, manager, state: Dict, val_loss: float):
        import orbax.checkpoint as ocp

        best, last = manager
        # Fetch once, write twice: handing both async managers the same
        # device arrays makes them each issue device-to-host reads
        # concurrently, which the tunneled runtime tolerates poorly (a
        # TPU-RPC hang was observed at exactly such a dual-save; the
        # state is ~1 MB, so one host copy is free).
        host_state = jax.device_get(state)
        step = int(host_state["step"])
        best.save(
            step,
            args=ocp.args.StandardSave(host_state),
            metrics={"val_loss": float(val_loss)},
        )
        last.save(step, args=ocp.args.StandardSave(host_state))

    def restore_checkpoint(self, manager, state: Dict) -> Tuple[Dict, int]:
        """Restore the newest checkpoint (across the best-on-val set and
        the ``last`` save) into the structure of ``state``."""
        import orbax.checkpoint as ocp

        best, last = manager
        candidates = [
            (m.latest_step(), m)
            for m in (best, last)
            if m.latest_step() is not None
        ]
        if not candidates:
            return state, 0
        latest, source = max(candidates, key=lambda c: c[0])
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.asarray(x).shape, jnp.asarray(x).dtype),
            state,
        )
        restored = source.restore(latest, args=ocp.args.StandardRestore(abstract))
        return restored, latest

    # -- logging -------------------------------------------------------------
    def _log(self, metrics: Dict, step: int):
        for logger in self.loggers:
            logger.log_metrics(metrics, step)

    def _log_audio(self, name: str, audio: np.ndarray, step: int):
        for logger in self.loggers:
            if hasattr(logger, "log_audio"):
                logger.log_audio(name, audio, int(self.model.sample_rate), step)

    def _log_params(self, params: Dict, step: int):
        """Reference's ``logger.watch(model, log="parameters")``: hand
        loggers that support it (WandbLogger) host-side parameter arrays
        once per val interval. ONE device_get, then host consumers only
        (concurrent device reads hang the tunneled runtime — CLAUDE.md
        rule 12)."""
        watchers = [l for l in self.loggers if hasattr(l, "log_params")]
        if not watchers:
            return
        host_params = jax.device_get(params)
        for logger in watchers:
            logger.log_params(host_params, step)

    # -- loops ---------------------------------------------------------------
    def evaluate(
        self,
        params: Dict,
        batches: Iterator[Dict],
        key: jax.Array,
        log_audio_step: Optional[int] = None,
        prefix: str = "val",
    ) -> float:
        total, count = None, 0
        for i, batch in enumerate(batches):
            batch = shard_batch(batch, self.mesh)
            loss, recon = self._eval_step(params, batch, jax.random.fold_in(key, i))
            # accumulate on device: one live scalar, one host read at the end
            total = loss if total is None else total + loss
            count += 1
            if i == 0 and log_audio_step is not None:
                self._log_audio(
                    f"{prefix}/original", np.asarray(batch["audio"][0]), log_audio_step
                )
                self._log_audio(
                    f"{prefix}/recon", np.asarray(recon[0]), log_audio_step
                )
        if count == 0:
            return float("nan")
        return float(np.asarray(total)) / count

    def fit(
        self,
        datamodule,
        restore: bool = False,
        initial_params: Optional[Dict] = None,
    ) -> Dict:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        init_key, data_key, train_key, eval_key = jax.random.split(key, 4)

        if initial_params is not None:
            state = train_state_from_params(initial_params, cfg)
        else:
            state = init_train_state(self.model, cfg, init_key)
        state = jax.device_put(state, replicated_sharding(self.mesh))

        manager = self._ckpt_manager(cfg.checkpoint_dir)
        if restore:
            state, restored_step = self.restore_checkpoint(manager, state)
            if restored_step:
                print(f"[trainer] resumed from step {restored_step}")

        # Fast path: stage the whole training split on device once and
        # gather batches inside the jitted step (see make_multi_train_step
        # / make_batch_gather). Lazy datasets (load_to_memory=False) use
        # the generic path below, which buffers host batches into chunks
        # and runs them through the same scan program — one dispatch and
        # one transfer per chunk instead of per step (the per-step
        # variant measured ~20x slower through the tunnel,
        # docs/DESIGN.md §2.3; chunking recovers most of that).
        device_data = None
        batch_size = getattr(datamodule, "batch_size", None)
        train_ds = None
        if hasattr(datamodule, "dataset"):
            train_ds = datamodule.dataset("train")
            if (
                len(train_ds)
                and batch_size
                and getattr(train_ds, "control", None) is not None
            ):
                denorm = train_ds.denormalize(train_ds.control)
                device_data = jax.device_put(
                    {
                        "audio": train_ds.audio,
                        "f0": denorm[:, :, 0],
                        "control": train_ds.control,
                    },
                    replicated_sharding(self.mesh),
                )
                bs = min(batch_size, len(train_ds))
                if bs < batch_size:
                    print(
                        f"[trainer] dataset has only {len(train_ds)} items; "
                        f"clamping batch size {batch_size} -> {bs}"
                    )

        step = int(state["step"])
        t_start = time.time()
        rng_host = np.random.default_rng(cfg.seed + 1)

        def log_window(mean_loss: float, n_steps: int):
            nonlocal t_start
            lr = float(make_lr_schedule(cfg)(step))
            rate = n_steps / max(1e-9, time.time() - t_start)
            t_start = time.time()
            self._log(
                {
                    "train/loss": mean_loss,
                    "train/lr": lr,
                    "train/steps_per_sec": rate,
                },
                step,
            )

        last_val_step = [-1]

        def run_val():
            last_val_step[0] = step
            # sub-stage profiling under NWS_TPU_HOST_PROFILE: the
            # val+checkpoint interval is the one fit stage that is pure
            # host+RTT overhead, so its internal split (eval dispatches
            # vs orbax saves) is what decides where to optimize.
            from ..utils.profiling import StageTimer

            vt = StageTimer() if os.environ.get("NWS_TPU_HOST_PROFILE") else None
            with vt.stage("eval") if vt else contextlib.nullcontext():
                val_loss = self.evaluate(
                    state["params"],
                    datamodule.val_batches(),
                    eval_key,
                    log_audio_step=step,
                )
            with vt.stage("log+params") if vt else contextlib.nullcontext():
                self._log({"val/loss": val_loss}, step)
                self._log_params(state["params"], step)
            with vt.stage("checkpoint") if vt else contextlib.nullcontext():
                self.save_checkpoint(manager, state, val_loss)
            if vt:
                print(f"[trainer] val profile @step {step}: {vt.report()}")

        if device_data is not None:
            # Chunked fast path: gcd-sized chunks of steps run as ONE
            # dispatch each (lax.scan inside jit); the host only builds
            # index matrices and reads one (chunk,) loss array per chunk.
            # NWS_TPU_HOST_PROFILE=1 prints where the host-side wall
            # time goes (dispatch RPCs vs the loss fetch that overlaps
            # device compute vs val/checkpoint), for diagnosing gaps
            # between end-to-end steps/s and the canonical device step.
            from ..utils.profiling import StageTimer

            host_timer = (
                StageTimer() if os.environ.get("NWS_TPU_HOST_PROFILE") else None
            )
            n = len(train_ds)
            index_pool: list = []

            def take_indices(count: int) -> np.ndarray:
                while len(index_pool) < count:
                    perm = rng_host.permutation(n)
                    usable = (n // bs) * bs
                    index_pool.extend(perm[:usable].tolist())
                out = np.asarray(index_pool[:count], np.int32)
                del index_pool[:count]
                return out

            def stage(name):
                return (
                    host_timer.stage(name) if host_timer
                    else contextlib.nullcontext()
                )

            base_chunk = _chunk_length(cfg)
            while step < cfg.max_steps:
                chunk = min(base_chunk, cfg.max_steps - step)
                with stage("indices"):
                    idx = take_indices(chunk * bs).reshape(chunk, bs)
                    idx_dev = jnp.asarray(idx)
                with stage("gather_dispatch"):
                    batches = self._gather_chunk(device_data, idx_dev)
                with stage("step_dispatch"):
                    state, losses = self._multi_step(state, batches, train_key)
                step += chunk
                self.last_progress = time.time()
                if step % cfg.log_every_n_steps == 0 or step >= cfg.max_steps:
                    with stage("loss_fetch+device_wait"):
                        mean_loss = float(np.asarray(losses).mean())
                    with stage("log"):
                        log_window(mean_loss, chunk)
                if step % cfg.val_every_n_steps == 0 or step >= cfg.max_steps:
                    with stage("val+checkpoint"):
                        run_val()
            if host_timer:
                print(f"[trainer] host profile: {host_timer.report()}")
        else:
            # Generic path: iterator datamodules (lazy datasets). Batches
            # are BUFFERED and run through the same N-step scan program
            # as the fast path — one dispatch (and one host->device
            # transfer) per chunk instead of per step. Measured at the
            # canonical harness (scripts/bench_data_path.py, batch 8,
            # v5e, 2026-08-18): 9.5 steps/s vs the on-device fast
            # path's 22.3 (2.35x); the per-step round-trip cliff this
            # replaced was ~20x. The gap is TRANSFER-bound (device_put
            # measures 10-43 MB/s through the tunnel; host assembly is
            # ~20 ms/step) — a deferred-loss-fetch overlap of assembly
            # with device compute was implemented and measured to buy
            # nothing (9.1 steps/s: transfers serialize with compute on
            # this runtime), so the fix that ships is the int16 audio
            # wire (TrainConfig.lazy_int16_wire) that quarters the
            # bytes instead.
            chunk_len = _chunk_length(cfg)

            next_log = (step // cfg.log_every_n_steps + 1) * cfg.log_every_n_steps
            next_val = (step // cfg.val_every_n_steps + 1) * cfg.val_every_n_steps
            window_loss, window_steps = 0.0, 0

            def account(losses_sum: float, n_steps: int):
                nonlocal window_loss, window_steps, next_log, next_val
                window_loss += losses_sum
                window_steps += n_steps
                self.last_progress = time.time()
                if step >= next_log:
                    log_window(window_loss / max(window_steps, 1), window_steps)
                    window_loss, window_steps = 0.0, 0
                    next_log += cfg.log_every_n_steps
                if step >= next_val:
                    run_val()
                    next_val += cfg.val_every_n_steps

            buf: list = []

            def flush_chunks(buffered):
                """Run as many full chunks as fit through the scan
                program (one dispatch + one transfer per chunk)."""
                nonlocal state, step
                while (
                    len(buffered) >= chunk_len
                    and step + chunk_len <= cfg.max_steps
                ):
                    def encode(k, arr):
                        if cfg.lazy_int16_wire and k == "audio":
                            return np.clip(
                                np.round(arr * 32767.0), -32768, 32767
                            ).astype(np.int16)
                        return arr

                    chunk_batches = {
                        k: jax.device_put(
                            encode(k, np.stack(
                                [b[k] for b in buffered[:chunk_len]]
                            )),
                            self._chunk_sharding[k],
                        )
                        for k in ("audio", "f0", "control")
                    }
                    del buffered[:chunk_len]
                    step_fn = (
                        self._multi_step_i16
                        if cfg.lazy_int16_wire else self._multi_step
                    )
                    state, losses = step_fn(
                        state, chunk_batches, train_key
                    )
                    step += chunk_len
                    account(float(np.asarray(losses).sum()), chunk_len)

            def drain_singles(buffered):
                nonlocal state, step
                while buffered and step < cfg.max_steps:
                    batch = buffered.pop(0)
                    state, metrics = self._train_step(
                        state, shard_batch(batch, self.mesh), train_key
                    )
                    step += 1
                    account(float(np.asarray(metrics["loss"])), 1)

            done = False
            epoch = 0
            while not done and step < cfg.max_steps:
                done = True
                # fold in the EPOCH counter, not just the step: with an
                # epoch shorter than one chunk, step doesn't advance
                # between epochs and a step-only key would replay the
                # identical permutation until a chunk finally executes
                epoch_key = jax.random.fold_in(
                    jax.random.fold_in(data_key, step), epoch
                )
                epoch += 1
                for batch in datamodule.train_batches(epoch_key):
                    done = False
                    if step >= cfg.max_steps:
                        break
                    buf.append({k: np.asarray(v) for k, v in batch.items()})
                    flush_chunks(buf)
                    if cfg.max_steps - step < chunk_len:
                        drain_singles(buf)
                # buf (an epoch tail shorter than one chunk) carries into
                # the next epoch — batches are drop-remainder uniform
            drain_singles(buf)
            if window_steps:
                log_window(window_loss / window_steps, window_steps)
            if step != last_val_step[0]:
                run_val()

        for m in manager:
            m.wait_until_finished()
        return state

    def test(self, state: Dict, datamodule, key: Optional[jax.Array] = None) -> float:
        key = key if key is not None else jax.random.PRNGKey(0)
        loss = self.evaluate(
            state["params"],
            datamodule.test_batches(),
            key,
            log_audio_step=int(state["step"]),
            prefix="test",
        )
        self._log({"test/loss": loss}, int(state["step"]))
        return loss
