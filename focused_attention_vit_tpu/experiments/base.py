"""Shared experiment machinery.

Every experiment follows the reference five-method protocol
setup → train → evaluate → save_results → run
(canonical shape: experiments/traditional.py:110-362) and shares:

* the data loading path (CIFAR-10/100 with ``subset_size`` debugging mode),
* a memory probe on a sample batch before training, at ``epochs//2`` and
  after (reference: experiments/traditional.py:167-174, 232-233, 246-248),
* per-epoch progress lines and a one-row CSV in ``results_dir``
  (reference: experiments/traditional.py:341-346).

The reference import-name mismatches (main.py:41-43, SURVEY.md §2.1) are
fixed by exporting both the corrected and the reference spellings.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
import pandas as pd

from focused_attention_vit_tpu.data import load_dataset
from focused_attention_vit_tpu.data.pipeline import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    prepare_eval_batch,
)
from focused_attention_vit_tpu.train import (
    make_train_step,
    make_eval_step,
    train_and_evaluate,
    evaluate,
)
from focused_attention_vit_tpu.utils.metrics import (
    calculate_model_size,
    calculate_vit_complexity,
    measure_memory_usage,
)


@dataclass
class ExperimentBase:
    """Config + pipeline shared by all experiments.

    Field names mirror the reference constructors 1:1
    (e.g. experiments/traditional.py:36-57) so CLI flags map straight
    through.
    """

    img_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 10
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    attn_dropout: float = 0.0
    embed_dropout: float = 0.0
    batch_size: int = 128
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    epochs: int = 50
    device: Optional[str] = None  # accepted for CLI parity; JAX picks the TPU
    data_dir: str = "./data"
    results_dir: str = "./results"
    subset_size: Optional[int] = None
    dataset: str = "cifar10"
    seed: int = 42
    # TPU-native extensions (strict supersets of the reference surface):
    checkpoint_dir: Optional[str] = None  # Orbax save/resume per epoch
    # Per-epoch checkpoint saves are asynchronous by default: an on-device
    # snapshot is taken (milliseconds) and the device→host pull + Orbax +
    # sidecar writes overlap the next epoch (train/checkpoint.py). True
    # restores blocking saves (each epoch waits for its checkpoint to
    # commit before training continues).
    sync_checkpoint: bool = False
    profile_dir: Optional[str] = None  # jax.profiler trace capture
    detailed_metrics: bool = True  # AUC + confusion matrix at evaluate()
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-native training
    remat: bool = False  # gradient checkpointing for long-sequence configs
    # Selective-remat policy under --remat (MHLA models): 'band_weights'
    # saves the band softmax weights across fwd→bwd instead of
    # recomputing them (models/layers.resolve_remat_policy; measured
    # neutral at the S=3137 bench config, BASELINE.md — a memory/geometry
    # tuning knob, not a default).
    remat_policy: Optional[str] = None
    # LR schedule over the whole run (reference protocol = constant LR,
    # experiments/traditional.py:152-157; these are opt-in extensions).
    lr_schedule: str = "constant"  # 'constant' | 'cosine'
    warmup_epochs: float = 0.0  # linear warmup, in (fractional) epochs
    grad_clip_norm: Optional[float] = None  # global-norm gradient clipping
    # AdamW first-moment dtype (optax mu_dtype): 'bfloat16' halves the
    # first moment's memory (nu stays f32 — its dynamic range does not
    # survive bf16). Opt-in: numerics differ slightly from the reference
    # protocol. Composes with --fsdp (bf16 moments shard like any leaf).
    mu_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # lax.scan over depth (stacked block params) — the scheduling lever for
    # the S=3137 geometry; random-init experiments only (pretrained loaders
    # produce loop-form params; convert with layers.stack_block_params).
    scan_layers: bool = False
    num_devices: Optional[int] = None  # >1 (or -1 = all) trains on a mesh
    # ZeRO-3-style fully-sharded data parallelism: params + AdamW moments
    # sharded over 'data' (largest divisible dim per leaf); GSPMD inserts
    # the just-in-time all-gather / grad reduce-scatter. Same trajectory
    # as DP, per-device param+optimizer memory divided by the data-axis
    # size. Composes with --tp/--pp (parallel/sharding._add_fsdp).
    fsdp: bool = False
    tp: int = 1  # 'model' (tensor-parallel) axis size of the mesh
    # 'seq' (sequence-parallel) axis size: shards the token axis of
    # activations and the windowed attention's halo-exchange band
    # (parallel/sequence.py) — MHLA-family models only.
    sp: int = 1
    # 'stage' (pipeline-parallel) axis size: shards the block stack over
    # pipeline stages (GPipe fill-drain, parallel/pipeline.py). Requires
    # --scan_layers (the pipeline consumes the stacked block params).
    pp: int = 1
    # Gradient-accumulation chunk inside the jitted step. None = auto
    # (16 on a single device — measured +66% ViT-B/16 throughput on v5e,
    # see BASELINE.md roofline; off on a mesh where the per-device batch is
    # already small). Explicit values compose with a mesh (chunks stay
    # batch-sharded over 'data'; must be a multiple of the DP size).
    # 0 disables.
    microbatch: Optional[int] = None

    # Set by train() when a SIGTERM stopped the run early (preemption —
    # train/resilience.py): the checkpoint is committed, evaluation and
    # CSV writing are skipped, and the CLI exits 143 so a supervisor
    # restarts the command (auto-resume continues the run).
    preempted: bool = field(default=False, init=False)

    # --- subclass hooks -----------------------------------------------------
    model_display_name: str = "Traditional ViT"
    csv_filename: str = "exp1_traditional.csv"
    # Auto microbatch (used when --microbatch is not given): measured on
    # v5e, 16 lifts dense-attention ViT-B/16 training +66% (the batch-128
    # S² working set degrades XLA's scheduling) but *hurts* windowed-MHLA
    # and SPPP models (small working sets, chunking only shrinks matmuls) —
    # those experiment classes override this to None.
    auto_microbatch: Optional[int] = 16

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def build_model(self):
        raise NotImplementedError

    def _slic_connectivity(self):
        """Map the CLI string to ops/slic's enforce_connectivity value."""
        v = getattr(self, "slic_connectivity", "auto")
        if isinstance(v, str):
            v = v.lower()
            if v == "auto":
                return "auto"
            if v == "host":
                return "host"
            if v in ("on", "true", "1"):
                return True
            if v in ("off", "false", "0"):
                return False
            raise ValueError(
                f"slic_connectivity must be auto/on/off/host, got {v!r}"
            )
        return bool(v)

    def build_params(self, model, rng, sample):
        """Default: random init. Pretrained experiments override."""
        return None  # create_train_state will init

    def _steps_per_epoch(self) -> int:
        n = len(self.data["train_images"]) if getattr(self, "data", None) else 0
        return max(n // self.batch_size, 1)

    def lr_for(self, base_lr: float):
        """base LR → float (reference protocol) or schedule (extension)."""
        from focused_attention_vit_tpu.train.state import make_lr_schedule

        spe = self._steps_per_epoch()
        return make_lr_schedule(
            base_lr,
            kind=self.lr_schedule,
            total_steps=self.epochs * spe,
            warmup_steps=int(round(self.warmup_epochs * spe)),
        )

    def _mu_dtype(self):
        """Resolve the mu_dtype config string to a jnp dtype (or None)."""
        if self.mu_dtype in (None, "float32", "f32"):
            return None
        if self.mu_dtype in ("bfloat16", "bf16"):
            import jax.numpy as jnp

            return jnp.bfloat16
        raise ValueError(
            f"--mu_dtype must be 'float32' or 'bfloat16', got "
            f"{self.mu_dtype!r}"
        )

    def build_optimizer(self, params):
        from focused_attention_vit_tpu.train.state import make_adamw

        return make_adamw(
            self.lr_for(self.learning_rate),
            self.weight_decay,
            grad_clip_norm=self.grad_clip_norm,
            mu_dtype=self._mu_dtype(),
        )

    def theoretical_metrics(self) -> Dict[str, Any]:
        return calculate_vit_complexity(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            in_channels=self.in_channels,
        )

    # --- pipeline -----------------------------------------------------------
    def setup(self):
        os.makedirs(self.results_dir, exist_ok=True)
        if self.dataset == "imagenet":
            from focused_attention_vit_tpu.data.imagenet import (
                load_imagenet_subset,
            )

            self.data = load_imagenet_subset(
                data_dir=os.path.join(self.data_dir, "imagenet"),
                subset_size=self.subset_size,
                seed=self.seed,
            )
        else:
            self.data = load_dataset(
                self.dataset,
                data_dir=self.data_dir,
                subset_size=self.subset_size,
                seed=self.seed,
            )
        # The dataset is the authority on class count: an ImageFolder tree
        # has however many class dirs it has — a head built for the config
        # default would train on out-of-range labels and feed mis-shaped
        # probabilities to the detailed metrics.
        data_classes = self.data.get("num_classes")
        if data_classes and data_classes != self.num_classes:
            print(
                f"num_classes: {self.dataset} provides {data_classes} "
                f"classes (config said {self.num_classes}) — using "
                f"{data_classes}"
            )
            self.num_classes = int(data_classes)
        self.mesh = self._build_mesh()
        self.model = self.build_model()
        if self.remat_policy and not self.remat:
            raise ValueError(
                "--remat_policy only applies under --remat (it selects "
                "what the per-block checkpointing saves)"
            )
        for flag in ("scan_layers", "remat", "remat_policy"):
            # 'full' is the explicit spelling of what --remat alone does,
            # so it is valid on any remat-capable model.
            if flag == "remat_policy" and self.remat_policy in (None, "full"):
                continue
            if getattr(self, flag, False) and not hasattr(self.model, flag):
                raise ValueError(
                    f"--{flag} is not supported by "
                    f"{type(self.model).__name__} (token-reduced SPPP "
                    f"models have tiny per-block state; the flag targets "
                    f"the long-sequence transformer stacks)"
                )
        if self.mesh is not None and "seq" in self.mesh.axis_names:
            # Sequence parallelism: the model itself carries the sp mesh
            # (token-axis GSPMD constraint + halo-exchange attention).
            if not hasattr(self.model, "sp_mesh"):
                raise ValueError(
                    f"--sp requires an MHLA-family model; "
                    f"{type(self.model).__name__} has no sequence-parallel "
                    f"support (dense attention is not window-local)"
                )
            self.model = self.model.clone(sp_mesh=self.mesh, sp_axis="seq")
        if self.mesh is not None and "stage" in self.mesh.axis_names:
            # Pipeline parallelism: blocks sharded over 'stage'
            # (parallel/pipeline.py). Needs the scan-form stacked params.
            if not hasattr(self.model, "pp_mesh"):
                raise ValueError(
                    f"--pp not supported by {type(self.model).__name__}"
                )
            if not getattr(self.model, "scan_layers", False):
                raise ValueError(
                    "--pp requires the scan-form block stack: pass "
                    "--scan_layers (random-init experiments; pretrained "
                    "experiments build loop-form params — convert with "
                    "layers.stack_block_params)"
                )
            self.model = self.model.clone(pp_mesh=self.mesh)

        rng = jax.random.PRNGKey(self.seed)
        sample = self._sample_batch()
        params = self.build_params(self.model, rng, sample)

        from focused_attention_vit_tpu.train.state import create_train_state

        if params is None:
            variables = self.model.init(rng, sample)
            params = variables["params"]
        tx = self.build_optimizer(params)
        self.state = create_train_state(self.model, rng, sample, tx, params=params)

        self.metrics: Dict[str, Any] = {}
        self.metrics["theoretical"] = self.theoretical_metrics()
        self.metrics["model_size"] = calculate_model_size(self.state.params)

        state_sharding = None
        if self.mesh is not None:
            from focused_attention_vit_tpu.parallel import (
                shard_state,
                state_shardings,
            )

            self.state = shard_state(self.state, self.mesh, fsdp=self.fsdp)
            if self.fsdp:
                # Pin the FSDP layout on both sides of the jitted step —
                # the partitioner must not densify the updated state.
                state_sharding = state_shardings(
                    self.state, self.mesh, fsdp=True
                )
        elif self.fsdp:
            raise ValueError(
                "--fsdp requires a device mesh (--num_devices/--tp/...): "
                "parameter sharding needs a 'data' axis to shard over"
            )

        self.train_step = make_train_step(
            self.img_size,
            compute_dtype=self.jnp_dtype,
            mesh=self.mesh,
            microbatch=self._effective_microbatch(),
            state_sharding=state_sharding,
        )
        self.eval_step = make_eval_step(
            self.img_size, compute_dtype=self.jnp_dtype, mesh=self.mesh
        )

    def _auto_microbatch_value(self) -> Optional[int]:
        """Geometry-aware auto-microbatch hook (subclasses override)."""
        return self.auto_microbatch

    def _effective_microbatch(self) -> Optional[int]:
        mb = self.microbatch
        if mb == 0:
            return None
        if mb is not None and mb < 0:
            raise ValueError(f"--microbatch must be positive (got {mb})")
        if mb is not None and self.mesh is not None:
            # Gradient accumulation composes with the mesh: every scan
            # chunk stays batch-sharded over 'data', so the microbatch
            # must split evenly across the data axis (the same loud-error
            # policy as the single-device divisor check below).
            dp = self.mesh.shape["data"]
            if mb % dp:
                raise ValueError(
                    f"--microbatch {mb} must be a multiple of the "
                    f"data-parallel axis size {dp} (each accumulation "
                    f"chunk is itself batch-sharded over 'data')"
                )
        if mb is not None:
            # Explicit flag: refuse values the step could not honor
            # instead of silently running monolithic (the same loud-error
            # policy as the mesh case above — a benchmark or OOM-avoidance
            # decision built on the flag must not be invalidated quietly).
            if not (self.batch_size > mb and self.batch_size % mb == 0):
                raise ValueError(
                    f"--microbatch {mb} must be a proper divisor of "
                    f"--batch_size {self.batch_size} (or 0 to disable)"
                )
            return mb
        # Auto: single-device only; a mesh already shrinks the
        # per-device batch. Auto values that don't divide the batch fall
        # back to monolithic silently — auto is a heuristic, not a request.
        if self.mesh is not None:
            return None
        mb = self._auto_microbatch_value()
        if not mb:
            return None
        return mb if (self.batch_size > mb and self.batch_size % mb == 0) else None

    def _build_mesh(self):
        """Build the ('data','model'[,'seq']) device mesh when multi-device
        training is requested (--num_devices / --tp / --sp). The reference
        has no distributed layer (SURVEY.md §2.4); this is the TPU-native
        DP/TP/SP addition."""
        # --sp composes with --pp since round 5: under PP the sequence
        # axis stays AUTO (GSPMD-sharded shift band instead of the manual
        # halo shard_map, which Shardy rejects inside the pipeline's
        # manual region) — see models/vit_mhla.py / models/layers.py
        # sp_gspmd.
        if (not self.num_devices and self.tp <= 1 and self.sp <= 1
                and self.pp <= 1):
            return None
        from focused_attention_vit_tpu.parallel import make_mesh

        n = self.num_devices
        if n is None or n <= 0:
            n = len(jax.devices())
        if n == 1 and self.tp <= 1 and self.sp <= 1 and self.pp <= 1:
            return None
        mesh = make_mesh(n, tp=self.tp, sp=self.sp, pp=self.pp)
        dp = mesh.shape["data"]
        if self.batch_size % dp:
            raise ValueError(
                f"batch_size={self.batch_size} must be divisible by the "
                f"data-parallel axis size {dp}"
            )
        print(
            f"Training on a {dict(mesh.shape)} device mesh "
            f"({mesh.devices.size} devices)"
        )
        return mesh

    def _sample_batch(self):
        import jax.numpy as jnp

        imgs = self.data["train_images"][: min(8, len(self.data["train_images"]))]
        return prepare_eval_batch(jnp.asarray(imgs), self.img_size)

    def _memory_probe(self, backward: bool) -> Dict[str, float]:
        sample = self._sample_batch()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sample = jax.device_put(sample, NamedSharding(self.mesh, P()))
        apply = lambda p: self.model.apply({"params": p}, sample)
        try:
            return measure_memory_usage(apply, self.state.params, backward=backward)
        except Exception:  # pragma: no cover — probe must never kill a run
            return {"gpu_memory_peak_mb": 0.0}

    def train(self):
        from focused_attention_vit_tpu.utils import profiling

        memory_usage = [self._memory_probe(backward=False)]
        half = self.epochs // 2

        ckpt_mngr = None
        start_epoch = 0
        if self.checkpoint_dir:
            from focused_attention_vit_tpu.train.checkpoint import (
                CheckpointManager,
            )

            ckpt_mngr = CheckpointManager(
                self.checkpoint_dir, async_save=not self.sync_checkpoint
            )
            latest = ckpt_mngr.latest_step()
            if latest is not None:
                restored = ckpt_mngr.restore(self.state)
                if restored is not None:
                    self.state = restored
                    if self.mesh is not None:
                        from focused_attention_vit_tpu.parallel import (
                            shard_state,
                        )

                        self.state = shard_state(
                            self.state, self.mesh, fsdp=self.fsdp
                        )
                    start_epoch = latest
                    print(f"Resumed from checkpoint epoch {latest}")

        def epoch_cb(epoch, state):
            # `epoch` is local to this (possibly resumed) segment; all
            # bookkeeping uses the GLOBAL epoch so checkpoints continue
            # the step numbering (a resumed run must not rewrite steps
            # 1..k and strand latest_step at the old maximum) and the
            # mid-run probe fires at the intended run midpoint.
            g = start_epoch + epoch
            if g == half:
                self.state = state
                memory_usage.append(self._memory_probe(backward=True))
            if ckpt_mngr is not None:
                ckpt_mngr.save(g + 1, state)

        # Preemption handling (SIGTERM → checkpoint → exit 143) is only
        # meaningful with somewhere to checkpoint; without a manager the
        # default signal disposition stays installed.
        interrupt = None
        if ckpt_mngr is not None:
            from focused_attention_vit_tpu.train.resilience import (
                GracefulShutdown,
            )

            interrupt = GracefulShutdown()

        with profiling.trace(self.profile_dir), (interrupt or nullcontext()):
            results = train_and_evaluate(
                self.state,
                self.train_step,
                self.eval_step,
                self.data,
                epochs=max(0, self.epochs - start_epoch),
                batch_size=self.batch_size,
                seed=self.seed,
                epoch_offset=start_epoch,
                epoch_callback=epoch_cb,
                should_stop=interrupt,
            )
        self.preempted = bool(results.pop("interrupted", False))
        mid_epoch = bool(results.pop("interrupted_mid_epoch", False))
        if self.preempted and ckpt_mngr is not None:
            g_done = start_epoch + len(results["train_losses"])
            if mid_epoch:
                # Mid-epoch state: checkpoint it as the next epoch — the
                # partial epoch counts as complete (its remaining batches
                # are skipped on resume), so trained work is never lost
                # and the resumed run still totals `epochs` epochs.
                g_done += 1
                ckpt_mngr.save(g_done, results["state"])
            print(
                f"Preempted (SIGTERM): training stopped at epoch {g_done}"
                + (
                    " (checkpoint committed); rerun the same command to"
                    " resume"
                    if g_done > 0
                    else " (before any training; a rerun starts fresh)"
                )
            )
        if ckpt_mngr is not None:
            ckpt_mngr.close()
        self.state = results.pop("state", self.state)
        if start_epoch >= self.epochs and self.epochs > 0:
            # Fully-trained checkpoint resumed with nothing left to train:
            # the 0-epoch segment produced no per-epoch metrics, but the
            # CSV's final_val columns must describe the restored model,
            # not read 0.0 (the run is a legitimate re-evaluation).
            print(
                f"Checkpoint already at epoch {start_epoch} >= "
                f"epochs={self.epochs}; skipping training and evaluating "
                f"the restored model"
            )
            val = evaluate(
                self.eval_step, self.state,
                self.data["test_images"], self.data["test_labels"],
                self.batch_size,
            )
            results["final_val_acc"] = val["acc"]
            results["final_val_loss"] = val["loss"]
        memory_usage.append(self._memory_probe(backward=False))
        results["memory_usage"] = memory_usage
        self.metrics["training"] = results

    def evaluate(self):
        ev = evaluate(
            self.eval_step,
            self.state,
            self.data["test_images"],
            self.data["test_labels"],
            self.batch_size,
        )
        self.metrics["evaluation"] = {
            "test_loss": ev["loss"],
            "test_acc": ev["acc"],
            "avg_inference_time": ev["avg_batch_time"],
            "avg_inference_time_per_image": ev["avg_image_time"],
        }
        print(
            f"Test Loss: {ev['loss']:.4f} | Test Acc: {ev['acc']:.2f}% | "
            f"Avg Inference Time per Batch: {ev['avg_batch_time']:.4f}s | "
            f"Avg Inference Time per Image: {ev['avg_image_time']:.4f}s"
        )

        if self.detailed_metrics:
            from focused_attention_vit_tpu.train.loop import evaluate_detailed

            det = evaluate_detailed(
                self.state,
                self.model,
                self.data["test_images"],
                self.data["test_labels"],
                self.batch_size,
                self.img_size,
                self.data["num_classes"],
                mesh=self.mesh,
            )
            self.metrics["evaluation_detailed"] = det
            np.save(
                os.path.join(
                    self.results_dir,
                    self.csv_filename.replace(".csv", "_confusion.npy"),
                ),
                det["confusion_matrix"],
            )
            print(
                f"AUC (macro OvR): {det['auc_macro_ovr']:.4f} | "
                f"confusion matrix saved"
            )

    # --- results ------------------------------------------------------------
    def results_row(self) -> Dict[str, Any]:
        """One-row results dict; the reference exp1 schema
        (experiments/traditional.py:318-338). Subclasses extend."""
        th = self.metrics["theoretical"]
        tr = self.metrics["training"]
        ev = self.metrics["evaluation"]
        peak = max(
            (
                m.get("gpu_memory_peak_mb", 0.0)
                for m in tr["memory_usage"]
            ),
            default=0.0,
        )
        return {
            "model": self.model_display_name,
            "img_size": self.img_size,
            "patch_size": self.patch_size,
            "embed_dim": self.embed_dim,
            "depth": self.depth,
            "num_heads": self.num_heads,
            "parameters": th["parameters"],
            "flops": th["flops"],
            "time_complexity": th["time_complexity"],
            "space_complexity_mb": th["space_complexity_mb"],
            "model_size_mb": self.metrics["model_size"]["size_mb"],
            "avg_epoch_time": tr["avg_epoch_time"],
            "total_training_time": tr["total_training_time"],
            "final_val_acc": tr["final_val_acc"],
            "final_val_loss": tr["final_val_loss"],
            "test_acc": ev["test_acc"],
            "test_loss": ev["test_loss"],
            "avg_inference_time_per_image": ev["avg_inference_time_per_image"],
            "peak_gpu_memory_mb": peak,
        }

    def save_results(self):
        csv_path = os.path.join(self.results_dir, self.csv_filename)
        pd.DataFrame([self.results_row()]).to_csv(csv_path, index=False)
        print(f"Results saved to {csv_path}")
        return csv_path

    def run(self):
        print("Setting up experiment...")
        self.setup()
        print("Starting training...")
        self.train()
        if self.preempted:
            print(
                "Experiment preempted — skipping evaluation/results "
                "(resume with the same command)."
            )
            return self.metrics
        print("Evaluating model...")
        self.evaluate()
        print("Saving results...")
        self.save_results()
        print("Experiment completed!")
        return self.metrics
