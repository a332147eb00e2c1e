"""Host training loop.

Replaces the Lightning Trainer + NeRFSystem orchestration (train.py:64-79,
models/nerf_system.py): builds the device-resident scene/ray store, drives
the jitted train step with the static phase derived from progress, renders
validation images, logs pose errors, and checkpoints via orbax with
auto-resume.

Throughput-relevant choices:
- device-resident ray store (tpu.store_on_device): the hot loop makes no
  host->device transfers at all — batch indices are drawn on device;
- the step donates the train state (tpu.donate_state) so optimizer buffers
  are reused in place;
- metrics come back to host only every `log_every` steps (device->host
  syncs would otherwise serialize the pipeline).
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.data import SceneMeta, load_training_data
from upnerf.evaluate.metrics import psnr as psnr_fn
from upnerf.geometry import procrustes, se3
from upnerf.parallel import (
    batch_sharding,
    fetch,
    is_main_process,
    is_multiprocess,
    make_mesh,
    put_local_shards,
    put_replicated,
    replicated_sharding,
)
from upnerf.utils import CheckpointManager, MetricLogger, get_pca_img, visualize_depth

from .optim import learning_rate_at, make_optimizer
from .schedules import schedule_phase
from .state import (
    RayStore,
    TrainState,
    init_params,
    init_pose_params,
    make_scene_constants,
)
from .step import StepConfig, make_eval_render, make_train_step


class _NullLogger:
    """Logger stub for non-zero processes in multi-controller runs: all
    filesystem/W&B side effects happen on process 0 only; every process
    still executes the same device programs (the SPMD contract)."""

    def log(self, *a, **k):
        pass

    def log_image(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, hparams: Dict[str, Any]):
        from upnerf.utils import enable_compile_cache

        enable_compile_cache()
        self.hp = hparams
        self.cfg = StepConfig.from_hparams(hparams)
        self.max_steps = hparams["max_steps"]
        self.debug = hparams.get("debug", False)
        self._nan_restarts = 0  # divergence-watchdog budget spent so far

        scene_np, store_np, meta = load_training_data(hparams)
        self.meta: SceneMeta = meta
        self.ray_offsets = np.asarray(scene_np["ray_offsets"])
        self.n_images = meta.N_images_train

        # Multi-controller awareness (DDP parity, train.py:70-72): every
        # process runs this same constructor/loop over ONE global mesh;
        # only filesystem/W&B side effects are gated to process 0.
        self.multiprocess = is_multiprocess()
        self.is_main = is_main_process()

        # tpu.n_devices: how many local devices join the 1-D data mesh
        # (0 = all). "tpu.data_axis" is the deprecated round-1 name.
        n_dev = hparams.get("tpu.n_devices", hparams.get("tpu.data_axis", 0))
        if self.multiprocess:
            # tpu.n_devices is documented as LOCAL devices — a config that
            # uses all of this host's devices is valid on any slice size;
            # only actual sub-slicing is unsupported multi-process.
            assert not n_dev or n_dev == len(jax.local_devices()), (
                "tpu.n_devices cannot sub-slice a host in multi-process "
                "runs: every process's local devices must join the global "
                f"mesh (got {n_dev}, host has {len(jax.local_devices())})"
            )
            n_dev = 0
        self.mesh = make_mesh(n_dev or 0)
        self.repl = replicated_sharding(self.mesh)
        self.bsh = batch_sharding(self.mesh)

        pyr_sigma = float(hparams.get("feat.pyramid_sigma", 0.0) or 0.0)
        self.scene = put_replicated(
            make_scene_constants(
                scene_np["Ks"], scene_np["poses"], scene_np["near_far"],
                scene_np["wh"], scene_np["feat_maps"],
                # the coarse pyramid level only matters when the feat.c2f
                # schedule will actually blend it in
                feat_pyramid_sigma=(
                    pyr_sigma if hparams.get("feat.c2f") else 0.0
                ),
            ),
            self.repl,
        )

        self.store_on_device = bool(hparams.get("tpu.store_on_device", True))
        if self.store_on_device:
            self.store = put_replicated(
                RayStore(
                    px=jnp.asarray(store_np["px"]),
                    py=jnp.asarray(store_np["py"]),
                    img_idx=jnp.asarray(store_np["img_idx"]),
                    rgb=jnp.asarray(store_np["rgb"]),
                    inv_depth=jnp.asarray(store_np["inv_depth"]),
                ),
                self.repl,
            )
            self.store_np = None
        else:
            self.store = None
            self.store_np = store_np
            from upnerf.data.prefetch import BatchPrefetcher

            # Each process samples its own batch_size/process_count rows
            # (disjoint seeds) and contributes them as the local shards of
            # the global sharded batch — the multi-host version of the
            # reference's per-rank DataLoader under DDP.
            n_proc = jax.process_count()
            assert self.cfg.batch_size % max(n_proc, 1) == 0, (
                self.cfg.batch_size, n_proc,
            )
            self.prefetcher = BatchPrefetcher(
                store_np,
                self.cfg.batch_size // n_proc,
                device_put=lambda b: put_local_shards(b, self.bsh),
                seed=hparams.get("seed", 42) + jax.process_index(),
            )
        self.n_rays = int(store_np["px"].shape[0])

        # optimizers (configure_optimizers, models/nerf_system.py:41-73)
        hp = hparams
        self.optimizer = make_optimizer(
            hp["optimizer.type"], hp["optimizer.lr"],
            hp["optimizer.scheduler.lr_end"], self.max_steps,
            hp["optimizer.scheduler.type"],
        )
        self.pose_optimizer = make_optimizer(
            hp["optimizer_pose.type"], hp["optimizer_pose.lr"],
            hp["optimizer_pose.scheduler.lr_end"], self.max_steps,
            hp["optimizer_pose.scheduler.type"],
        )

        key = jax.random.PRNGKey(hp.get("seed", 42))
        params = init_params(key, self.cfg.nerf, self.cfg.transient, self.n_images)
        pose_params = init_pose_params(self.n_images)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            pose_params=pose_params,
            opt_state=self.optimizer.init(params),
            pose_opt_state=self.pose_optimizer.init(pose_params),
            rng=jax.random.key_data(
                jax.random.key(
                    hp.get("seed", 42) + 1, impl=self.cfg.prng_impl
                )
            ),
        )
        self.state = put_replicated(state, self.repl)

        donate = bool(hp.get("tpu.donate_state", True))
        self.step_fn, self.batch_step_fn = make_train_step(
            self.cfg, self.optimizer, self.pose_optimizer, donate=donate,
            mesh=self.mesh if len(self.mesh.devices.ravel()) > 1 else None,
        )
        n_dev = len(self.mesh.devices.ravel())
        # Val renders shard across the mesh too (chunk interiors split over
        # the data axis) whenever the chunk divides evenly; otherwise fall
        # back to single-device rendering rather than fail.
        self.eval_render = make_eval_render(
            self.cfg, hp["val.chunk_size"],
            mesh=self.mesh
            if n_dev > 1 and hp["val.chunk_size"] % n_dev == 0
            else None,
        )

        # experiment dir + ckpt/logging (train.py:29-49)
        self.save_dir = os.path.join(
            hp["out_dir"], hp["scene_name"], hp["exp_name"]
        )
        os.makedirs(self.save_dir, exist_ok=True)
        self.ckpt = CheckpointManager(os.path.join(self.save_dir, "ckpts"))
        # Orbax coordinates multi-process writers itself (every process
        # calls save/restore); the metric/image sink is process-0 only.
        self.logger = (
            MetricLogger(self.save_dir, config=hparams)
            if self.is_main
            else _NullLogger()
        )

        # val cadence: fraction of an epoch (Lightning val_check_interval
        # semantics, train.py:69) or absolute steps when >= 1.
        li = hp["val.log_interval"]
        steps_per_epoch = max(1, self.n_rays // self.cfg.batch_size)
        self.val_interval = int(li) if li >= 1 else max(1, int(li * steps_per_epoch))
        self.ckpt_interval = hp.get("train.ckpt_interval", 10000)
        self.log_pose_interval = hp.get("train.log_pose_interval", 3000)

        # GT-free pose-warp (basin-stall) detection, optional multistart
        # mitigation (upnerf/train/warp.py; no reference equivalent). The
        # detector consumes the per-image loss vectors the step metrics
        # already carry; in multi-process runs every controller sees the
        # same pmean'd metrics and shares the detector/rng seed, so
        # mitigation decisions are bit-identical across processes.
        from .warp import WarpConfig, WarpDetector

        self.warp_cfg = WarpConfig.from_hparams(hp)
        if (self.warp_cfg.mitigate == "multistart"
                and not self.cfg.render.encode_feat):
            import warnings

            warnings.warn(
                "pose.warp.mitigate=multistart needs feature encoding "
                "(nerf.feat_dim > 0); mitigation disabled"
            )
            self.warp_cfg = self.warp_cfg._replace(mitigate="none")
        self._warp = (
            WarpDetector(self.n_images, self.warp_cfg)
            if self.warp_cfg.detect and self.cfg.pose_optimize
            else None
        )
        self._warp_scorer = None
        self._warp_rng = np.random.RandomState(hp.get("seed", 42) + 977)
        self.val_img_idx = list(hp.get("val.img_idx", (0,)))
        # Validation renders at downscale >= 2 even for scale-1 training
        # (reference OOM guard, datasets/phototourism.py:53-54): load the
        # val images + intrinsics separately at the floored scale.
        self._setup_val_scale()

    def _setup_val_scale(self):
        self.val_scale = max(2, self.meta.scale)
        self.val_data = None
        if self.val_scale == self.meta.scale:
            return
        import os as _os

        from upnerf.data.images import load_rgb_u8

        factor = self.meta.scale / self.val_scale
        Ks = np.asarray(self.scene.Ks)
        val_Ks = Ks.copy()
        val_Ks[:, :2, :] *= factor  # fx, fy, cx, cy scale with resolution
        wh = []
        rgbs = {}
        for img_i in self.val_img_idx:
            id_ = self.meta.img_ids_train[img_i]
            img = load_rgb_u8(
                _os.path.join(self.meta.image_dir, self.meta.image_paths[id_]),
                self.val_scale,
            )
            rgbs[img_i] = img
        base_wh = np.asarray(self.scene.wh)
        val_wh = np.maximum((base_wh * factor).astype(np.int64), 1)
        for img_i, img in rgbs.items():
            val_wh[img_i] = [img.shape[1], img.shape[0]]
        self.val_data = {
            "scene": self.scene._replace(
                Ks=put_replicated(jnp.asarray(val_Ks), self.repl),
                wh=put_replicated(jnp.asarray(val_wh, jnp.int32), self.repl),
            ),
            "rgbs": rgbs,
        }

    # --- training ----------------------------------------------------------

    def fit(
        self, log_every: int = 100, resume: bool = True, max_steps: Optional[int] = None
    ) -> TrainState:
        resume_ckpt = self.hp.get("resume_ckpt")
        if resume and resume_ckpt not in (None, "None", ""):
            # explicit restart checkpoint wins over auto-resume
            # (train.py:34-40)
            self.state = self._restore_explicit(resume_ckpt)
            if self.is_main:
                print(
                    f"[upnerf] restarted from {resume_ckpt} "
                    f"at step {int(self.state.step)}"
                )
        elif resume and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            if self.is_main:
                print(f"[upnerf] resumed from step {int(self.state.step)}")
        max_steps = max_steps or self.max_steps

        t0 = time.time()
        window_rays = 0
        last_saved = None
        step = int(self.state.step)
        restore_handlers = self._install_preemption_handlers()
        # On-demand device trace (A1 profiling/tracing; richer than the
        # reference's Lightning `profiler="simple"` wall-time table,
        # train.py:75): train.profile_at=N captures train.profile_steps
        # steady-state steps into <run>/profile/ as a chrome-trace the
        # scripts/profile_train_step.py parser (or Perfetto) reads.
        profile_at = int(self.hp.get("train.profile_at", 0) or 0)
        profile_steps = int(self.hp.get("train.profile_steps", 3))
        profile_until = None
        try:
            while step < max_steps:
                phase = schedule_phase(
                    step / self.max_steps, self.cfg.candidate_schedule
                )
                if self.store_on_device:
                    self.state, metrics = self.step_fn(
                        self.state, self.scene, self.store, phase
                    )
                else:
                    batch = next(self.prefetcher)
                    self.state, metrics = self.batch_step_fn(
                        self.state, self.scene, batch, phase
                    )
                step += 1
                window_rays += self.cfg.batch_size

                if profile_at and step == profile_at:
                    # sync first so the trace holds only steady-state steps
                    float(jax.device_get(self.state.step))
                    profile_dir = os.path.join(self.save_dir, "profile")
                    if self.multiprocess:  # one trace dir per controller
                        profile_dir += f"-proc{jax.process_index()}"
                    jax.profiler.start_trace(profile_dir)
                    profile_until = step + profile_steps
                if profile_until is not None and step >= profile_until:
                    # data-dependent fetch: the profiled steps must have
                    # executed before the trace closes (axon-relay rule)
                    float(jax.device_get(self.state.step))
                    jax.profiler.stop_trace()
                    profile_until = None
                    if self.is_main:
                        print(
                            f"[upnerf] device trace ({profile_steps} steps "
                            f"from {profile_at}) -> {profile_dir}"
                        )

                if step % log_every == 0 or step == max_steps:
                    # one batched device->host fetch (scalar round-trips
                    # cost ~30 ms each through the remote-TPU relay)
                    fetched = jax.device_get(metrics)
                    # per-image vectors feed the warp detector, not the
                    # scalar log
                    img_sum = fetched.pop("img_loss_sum", None)
                    img_cnt = fetched.pop("img_loss_cnt", None)
                    m = {k_: float(v) for k_, v in fetched.items()}
                    # divergence watchdog: judge by the total loss only
                    # (psnr is legitimately +inf on a perfect fit)
                    if not math.isfinite(m.get("loss", 0.0)):
                        step = self._recover_from_nonfinite(step, m)
                        t0 = time.time()
                        window_rays = 0
                        continue
                    dt = time.time() - t0
                    m["rays_per_sec"] = window_rays / max(dt, 1e-9)
                    m["lr"] = learning_rate_at(
                        step, self.hp["optimizer.lr"],
                        self.hp["optimizer.scheduler.lr_end"], self.max_steps,
                    )
                    m["lr_pose"] = learning_rate_at(
                        step, self.hp["optimizer_pose.lr"],
                        self.hp["optimizer_pose.scheduler.lr_end"],
                        self.max_steps,
                    )
                    m["phase"] = phase
                    self.logger.log(step, m)
                    if self._warp is not None and img_sum is not None:
                        self._warp_check(step, img_sum, img_cnt)
                    t0 = time.time()
                    window_rays = 0

                if self.log_pose_interval and step % self.log_pose_interval == 0:
                    self.log_pose(step)

                if step % self.val_interval == 0 or step == max_steps:
                    val_psnr = self.validate(step)
                    self.ckpt.save(step, self.state, {"val_psnr": val_psnr})
                    last_saved = step
                elif step % self.ckpt_interval == 0:
                    self.ckpt.save(step, self.state)
                    last_saved = step

                if self._preempted is not None:
                    # Preemption-safe shutdown (no reference equivalent —
                    # Lightning dies mid-step and loses everything since
                    # the last ModelCheckpoint): the signal handler only
                    # sets a flag; HERE, between steps, the state is
                    # consistent, so checkpoint it and leave cleanly.
                    # Auto-resume (train.py:34-40 semantics) continues
                    # from this exact step on relaunch.
                    if last_saved != step:
                        self.ckpt.save(step, self.state)
                        last_saved = step
                    if self.is_main:
                        print(
                            f"[upnerf] caught signal {self._preempted}; "
                            f"checkpointed step {step} and stopped cleanly"
                        )
                    break
        finally:
            if profile_until is not None:  # fit ended mid-capture
                jax.profiler.stop_trace()
            if restore_handlers:
                import signal as _signal

                for sig, old in restore_handlers.items():
                    _signal.signal(sig, old)
        return self.state

    def _install_preemption_handlers(self):
        """SIGTERM/SIGINT -> flag-only handler (checked between steps).
        SIGTERM is what TPU-pod preemption and every scheduler's grace
        window deliver. The original handlers are restored by fit(); a
        second SIGINT falls through to the restored KeyboardInterrupt
        behavior (the handler restores it immediately, so mash Ctrl-C
        twice to hard-stop). Off the main thread (e.g. Trainer driven
        from a test harness thread) signal.signal is illegal — handlers
        are skipped and the flag just stays unset.

        Multi-controller caveat: the shutdown save is a COLLECTIVE orbax
        write, so it is safe exactly when every process receives the
        signal (the pod-preemption case — schedulers signal all hosts).
        Signalling a single worker of a live cluster instead leaves it
        waiting in the save barrier until the grace period kills it."""
        import signal
        import threading

        self._preempted = None
        restore = {}
        if not bool(self.hp.get("train.graceful_shutdown", True)):
            return restore
        if threading.current_thread() is not threading.main_thread():
            return restore

        def _flag(signum, frame):
            self._preempted = signum
            if signum == signal.SIGINT:
                signal.signal(signal.SIGINT, restore[signal.SIGINT])

        for sig in (signal.SIGTERM, signal.SIGINT):
            restore[sig] = signal.signal(sig, _flag)
        return restore

    def _restore_explicit(self, path: str) -> TrainState:
        """Restore from an explicit checkpoint location (`resume_ckpt`,
        train.py:34-40): a run directory, its ckpts/ subdirectory, or a
        specific step directory inside it all work."""
        path = os.path.abspath(str(path))
        step = None
        base = os.path.basename(path.rstrip("/"))
        if base.isdigit():
            step, path = int(base), os.path.dirname(path)
        if os.path.isdir(os.path.join(path, "ckpts")):
            path = os.path.join(path, "ckpts")
        src = CheckpointManager(path)
        try:
            return src.restore(self.state, step=step)
        finally:
            src.close()

    def _warp_check(self, step: int, img_sum, img_cnt) -> None:
        """Feed one log point's per-image loss vectors to the warp
        detector; on sustained flags, optionally run the scored pose
        multistart (upnerf/train/warp.py). Runs identically on every
        controller (shared rng seed, pmean'd metrics), so multi-process
        states stay bit-identical."""
        flags = self._warp.update(img_sum, img_cnt, step / self.max_steps)
        # always log the worst EMA ratio: the audit trail for tuning
        # pose.warp.ratio against real runs (vectors themselves stay
        # host-side only)
        self.logger.log(
            step, {"train/warp_max_ratio": float(self._warp.ema.max())}
        )
        if not flags.any():
            return
        self.logger.log(step, {"train/warp_flagged": float(flags.sum())})
        if self.is_main:
            print(
                f"[upnerf] warp detector: image(s) "
                f"{np.nonzero(flags)[0].tolist()} stalled above "
                f"{self.warp_cfg.ratio}x median loss at step {step}"
            )
        if (self.warp_cfg.mitigate not in ("multistart", "reset")
                or not self._warp.budget_left):
            return

        from . import warp as warp_mod

        se3_tab = np.asarray(jax.device_get(self.state.pose_params["se3"]))
        if self.warp_cfg.mitigate == "reset":
            # Forced collective reset: re-anchor every flagged row to its
            # BASE pose (se3 refinement = 0). Measured motivation
            # (DESIGN.md "Basin-lever A/B"): in a real collective warp
            # the NeRF field co-adapts to the warped poses, so the scored
            # multistart's incumbent wins every candidate comparison
            # (cur ~10x below base) and mitigation never fires — scoring
            # against the model's own field cannot see out of a jointly
            # warped model+pose basin. The reset does not consult the
            # field at all; the DINO feature targets (phase 0/1 loss) are
            # pose-independent anchors that re-align the reset rows, and
            # successive detector events walk through the warped arc as
            # its worst offenders surface ("unzipping").
            new_tab = np.array(se3_tab)
            new_tab[flags] = 0.0
            adopted = np.nonzero(flags)[0]
        else:
            if self._warp_scorer is None:
                self._warp_scorer = warp_mod.make_pose_scorer(
                    self.cfg, self.warp_cfg.score_rays,
                    self.warp_cfg.score_progress,
                )
            wh = np.asarray(jax.device_get(self.scene.wh))
            new_tab, adopted = warp_mod.run_multistart(
                self._warp_scorer, self.state.params, self.scene, se3_tab,
                flags, wh, self.warp_cfg, self._warp_rng,
                log=print if self.is_main else (lambda *a, **k: None),
            )
        self._warp.start_cooldown()
        if adopted.size == 0:
            return
        pose_params = dict(self.state.pose_params)
        pose_params["se3"] = jnp.asarray(new_tab)
        self.state = put_replicated(
            self.state._replace(
                pose_params=pose_params,
                pose_opt_state=warp_mod.reset_opt_rows(
                    self.state.pose_opt_state, adopted, tuple(se3_tab.shape)
                ),
            ),
            self.repl,
        )
        self.logger.log(
            step,
            {"train/warp_event": float(adopted.size),
             "train/warp_events_total": float(self._warp.events)},
        )
        if self.is_main:
            print(
                f"[upnerf] warp {self.warp_cfg.mitigate} adopted new pose(s) for "
                f"image(s) {adopted.tolist()} at step {step} "
                f"(event {self._warp.events}/{self.warp_cfg.max_events})"
            )

    def _recover_from_nonfinite(self, step: int, m: Dict[str, float]) -> int:
        """Divergence watchdog (failure detection, no reference equivalent:
        Lightning trains straight through a NaN). A non-finite total loss at
        a log point means the state is already poisoned — the fused step
        applies the optimizer updates, so the NaN has propagated into the
        parameters. Restore the latest checkpoint, re-fold the sample-stream
        RNG so the retried trajectory draws different batches, and abort
        with a clear error once `train.max_nan_restarts` (default 2)
        restores have been spent (or none exists to restore)."""
        self._nan_restarts += 1
        budget = int(self.hp.get("train.max_nan_restarts", 2))
        bad = sorted(
            k for k, v in m.items()
            if (k == "loss" or k.startswith("loss/")) and not math.isfinite(v)
        )
        if self.ckpt.latest_step() is None:
            raise FloatingPointError(
                f"non-finite loss at step {step} ({bad}) before the first "
                "checkpoint — lower the learning rate or check the data"
            )
        if self._nan_restarts > budget:
            raise FloatingPointError(
                f"non-finite loss at step {step} ({bad}) after "
                f"{budget} checkpoint restore(s) — training diverges "
                "reproducibly; lower the learning rate or check the data"
            )
        self.state = self.ckpt.restore(self.state)
        restored = int(self.state.step)
        if self.state.rng is not None:
            key = jax.random.wrap_key_data(
                self.state.rng, impl=self.cfg.prng_impl
            )
            self.state = self.state._replace(
                rng=jax.random.key_data(
                    jax.random.fold_in(key, self._nan_restarts)
                )
            )
        self.logger.log(step, {"train/nonfinite_restart": float(restored)})
        if self.is_main:
            print(
                f"[upnerf] non-finite loss at step {step} ({bad}); restored "
                f"step {restored}, retry {self._nan_restarts}/{budget}"
            )
        return restored

    # --- validation (models/nerf_system.py:231-318) ------------------------

    def _image_pixels(self, img_i: int) -> Dict[str, jnp.ndarray]:
        lo, hi = int(self.ray_offsets[img_i]), int(self.ray_offsets[img_i + 1])
        n = hi - lo
        chunk = self.hp["val.chunk_size"]
        pad = (-n) % chunk
        if self.store_np is not None:
            px = np.asarray(self.store_np["px"][lo:hi])
            py = np.asarray(self.store_np["py"][lo:hi])
        else:
            px = np.asarray(self.store.px[lo:hi])
            py = np.asarray(self.store.py[lo:hi])
        invd = (
            np.asarray(self.store_np["inv_depth"][lo:hi])
            if self.store_np is not None
            else np.asarray(self.store.inv_depth[lo:hi])
        )
        batch = {
            "px": np.pad(px, (0, pad)).astype(np.float32),
            "py": np.pad(py, (0, pad)).astype(np.float32),
            "img_idx": np.full(n + pad, img_i, np.int32),
            "inv_depth": np.pad(invd, (0, pad)).astype(np.float32),
        }
        return {k: jnp.asarray(v) for k, v in batch.items()}, n

    def _val_image_pixels(self, img_i: int):
        """Full pixel grid at the val scale (scale-1 training only)."""
        img = self.val_data["rgbs"][img_i]
        h, w = img.shape[:2]
        jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        n = h * w
        chunk = self.hp["val.chunk_size"]
        pad = (-n) % chunk
        batch = {
            "px": np.pad(ii.ravel().astype(np.float32), (0, pad)),
            "py": np.pad(jj.ravel().astype(np.float32), (0, pad)),
            "img_idx": np.full(n + pad, img_i, np.int32),
            "inv_depth": np.zeros(n + pad, np.float32),
        }
        return {k: jnp.asarray(v) for k, v in batch.items()}, n

    def render_image(self, img_i: int):
        """Render one train-split image at the current state; returns
        (results dict cropped to n rays, (W, H))."""
        if self.val_data is not None:
            batch, n = self._val_image_pixels(img_i)
            scene = self.val_data["scene"]
        else:
            batch, n = self._image_pixels(img_i)
            scene = self.scene
        step = int(self.state.step)
        phase = schedule_phase(step / self.max_steps, self.cfg.candidate_schedule)
        out = self.eval_render(
            self.state.params, self.state.pose_params, scene, batch,
            jnp.asarray(step / self.max_steps, jnp.float32), phase,
        )
        # Under a multi-process mesh the render output is sharded across
        # hosts; fetch() allgathers it so every process sees the full image
        # (single-process: a plain local copy).
        out = {k: v[:n] for k, v in fetch(out).items()}
        w, h = (int(x) for x in np.asarray(scene.wh[img_i]))
        return out, (w, h)

    def validate(self, step: int) -> float:
        psnrs = []
        for img_i in self.val_img_idx:
            out, (w, h) = self.render_image(img_i)
            if self.val_data is not None:
                rgb_gt = (
                    self.val_data["rgbs"][img_i].reshape(-1, 3).astype(np.float32)
                    / 255.0
                )
            else:
                lo, hi = int(self.ray_offsets[img_i]), int(self.ray_offsets[img_i + 1])
                rgb_gt = (
                    np.asarray(
                        self.store_np["rgb"][lo:hi]
                        if self.store_np is not None
                        else self.store.rgb[lo:hi]
                    ).astype(np.float32)
                    / 255.0
                )
            # val PSNR uses the transient-COMPOSITED rgb when present
            # (models/nerf_system.py:266-269)
            typ = "fine" if self.cfg.loss.fine else "coarse"
            key = next(
                (k for k in (f"rgb_{typ}", f"s_rgb_{typ}") if k in out), None
            )
            if key is not None:
                psnrs.append(float(psnr_fn(jnp.asarray(out[key]), jnp.asarray(rgb_gt))))
            if not self.debug and self.is_main:
                self._log_val_images(step, img_i, out, rgb_gt, (w, h))
        val_psnr = float(np.mean(psnrs)) if psnrs else 0.0
        self.logger.log(step, {"val/psnr": val_psnr})
        return val_psnr

    def _log_val_images(self, step, img_i, out, rgb_gt, wh):
        # panel names match the reference's W&B sink exactly
        # (models/nerf_system.py:290-307): val_{idx}/viz/<name>
        w, h = wh

        def _pca(img):
            flat = img.reshape(-1, img.shape[-1])
            mean = flat.mean(0)
            _, _, vt = np.linalg.svd(
                flat[:: max(1, len(flat) // 2048)] - mean, full_matrices=False
            )
            return get_pca_img(img, mean, vt[:3])

        self.logger.log_image(
            step, f"val_{img_i}/viz/rgb_GT", rgb_gt.reshape(h, w, 3)
        )
        if "feats_gt" in out:
            self.logger.log_image(
                step, f"val_{img_i}/viz/feat_GT",
                _pca(out["feats_gt"].reshape(h, w, -1)),
            )
        if "pred_depth" in out:  # scale/shifted DPT prior (rescale_depth_GT)
            self.logger.log_image(
                step, f"val_{img_i}/viz/rescale_depth_GT",
                visualize_depth(out["pred_depth"].reshape(h, w)),
            )
        for name in self.hp.get("val.log_image_list", ()):  # nerf_system.py:293-307
            try:
                if name in ("t_beta", "t_alpha", "t_rgb") and name in out:
                    img = out[name].reshape(h, w, -1)
                    img = img / max(img.max(), 1e-9)
                    if img.shape[-1] == 1:
                        img = np.repeat(img, 3, -1)
                    self.logger.log_image(step, f"val_{img_i}/viz/{name}", img)
                elif "depth" in name and name in out:
                    self.logger.log_image(
                        step, f"val_{img_i}/viz/{name}",
                        visualize_depth(out[name].reshape(h, w)),
                    )
                elif "feat" in name and name in out:
                    # quick PCA from the map itself (pca_infos are viz-only)
                    self.logger.log_image(
                        step, f"val_{img_i}/viz/{name}",
                        _pca(out[name].reshape(h, w, -1)),
                    )
                elif "rgb" in name and name in out:
                    self.logger.log_image(
                        step, f"val_{img_i}/viz/{name}", out[name].reshape(h, w, 3)
                    )
            except Exception as e:  # viz must never kill training, but
                import warnings  # a broken panel should be visible

                warnings.warn(f"val image panel {name!r} failed: {e!r}")

    # --- pose-error logging (models/nerf_system.py:411-450) ----------------

    def log_pose(self, step: int):
        if self.meta.GT_poses_dict is None:
            return
        base = np.stack(
            [np.asarray(self.meta.poses_dict[i]) for i in self.meta.img_ids_train]
        )
        gt = np.stack(
            [np.asarray(self.meta.GT_poses_dict[i]) for i in self.meta.img_ids_train]
        )
        refine = se3.se3_to_SE3(self.state.pose_params["se3"])
        refined = np.asarray(se3.compose([refine, jnp.asarray(base)]))
        err, aligned, gt_parsed = procrustes.pose_metric(
            jnp.asarray(refined), jnp.asarray(gt)
        )
        # Gauge-free pairwise metric alongside the reference's Procrustes
        # numbers: the center alignment is reflection-bistable on small /
        # near-coplanar camera sets, so pose_R alone can flip by ~180 deg
        # between equivalent runs (see docs/DESIGN.md).
        rel = procrustes.relative_pose_error(jnp.asarray(refined), jnp.asarray(gt))
        pose_m = {
            "train/pose_R_rel": float(np.mean(rel["R"])) * 180 / math.pi,
            "train/pose_t_rel": float(np.mean(rel["t"])),
        }
        if err is not None:
            pose_m["train/pose_R"] = (
                float(np.mean(np.asarray(err["R"]))) * 180 / math.pi
            )
            pose_m["train/pose_t"] = float(np.mean(np.asarray(err["t"])))
        self.logger.log(step, pose_m)
        if not self.debug and self.is_main:
            try:
                from upnerf.utils.viz import get_pose_image

                n = min(20, len(refined))
                img = get_pose_image(
                    np.asarray(aligned)[:n], np.asarray(gt_parsed)[:n]
                )
                self.logger.log_image(step, "train/refine_pose", img)
            except Exception as e:  # viz must never kill training, but
                import warnings  # a broken panel should be visible

                warnings.warn(f"pose viz panel failed: {e!r}")
