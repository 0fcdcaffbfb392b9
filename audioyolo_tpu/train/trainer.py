"""Training engine (reference ``pipeline/_trainer.py:13-127``), TPU-first.

One jitted ``train_step`` owns forward, loss (with in-graph metrics), backward,
optimizer update, BatchNorm stat updates, and EMA — donated state, no host
sync inside the epoch loop. Per-batch metric scalars stay on device and are
materialized once per epoch (the reference's ``.item()``-per-metric-per-batch
and host sklearn calls are the hot-loop stalls flagged in SURVEY.md §3.1).

Data parallelism: pass a ``jax.sharding.Mesh``; the batch is sharded over its
``data`` axis and state is replicated, with XLA inserting the gradient
all-reduce over ICI (SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from datetime import datetime
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization, struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ema import EMAState, ema_init, ema_update
from .loss import AudioDetectionLoss

METRIC_KEYS = (
    "aggregate_loss", "mean_ciou", "conf_loss", "avg_pos_conf", "avg_neg_conf",
    "class_loss", "accuracy", "f1", "precision", "recall",
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[EMAState]
    step: jax.Array


class TrainerPipeline:
    def __init__(
        self,
        model,
        loss_fn: AudioDetectionLoss,
        tx,
        model_path: str = "saved_model",
        metrics_path: str = "metrics",
        ema_config: Optional[Dict[str, Any]] = None,
        use_ema: bool = False,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        seed: int = 42,
        steps_per_dispatch: int = 1,
        remat: bool = False,
        prng_impl: Optional[str] = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.tx = tx
        self.model_path = model_path
        self.metrics_path = metrics_path
        self.use_ema = use_ema
        self.ema_config = dict(ema_config or {})
        self.mesh = mesh
        self.data_axis = data_axis
        # ``prng_impl="rbg"``: draw dropout masks from the TPU's hardware RNG
        # instead of threefry. threefry is ALU-heavy and the per-step mask at
        # (B, H, W, 64) measured ~10% of the whole train step at B=128
        # (docs/PERFORMANCE.md round 5: dropout 0.4 -> 0.0 diagnostic gave
        # 504k -> 558k audio-s/s). rbg is deterministic per key with the same
        # uniform distribution — a different (but fixed) random stream, so
        # per-step numerics differ from threefry while convergence behavior
        # is statistically identical. Default None keeps threefry
        # (reproducibility with earlier checkpoints' training curves).
        if prng_impl:
            self.base_key = jax.random.key(seed, impl=prng_impl)
        else:
            self.base_key = jax.random.PRNGKey(seed)
        self.saved_model_path = os.path.join(model_path, "AudioDetectionModel.msgpack")

        self._train_metrics: List[Dict[str, float]] = []
        self._eval_metrics: List[Dict[str, float]] = []
        self.checkpoint_extra: Optional[Dict[str, Any]] = None
        # Host dispatch through a remote runtime costs ~3 ms per jitted call
        # on a 1-core host (measured: 9.8 ms wall vs 6.7 ms device at B=32);
        # unrolling S sequential optimizer steps into ONE compiled program
        # amortizes it S-fold. Semantics identical to S separate steps
        # (tested); epochs whose batch count is not a multiple of S run the
        # remainder through the single-step path.
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        # Selective rematerialization: keep ONLY the named conv outputs (and
        # the frontend image) as backward residuals — every BatchNorm /
        # activation intermediate is recomputed from the nearest saved conv
        # output instead of being stored. BatchNorm normalizes in fp32 even
        # under a bf16 body (torch-exact stats, models/layers.py), so the
        # default tape is mostly fp32; this knob drops it to pure compute
        # dtype. Numerically exact (same ops, re-run), trades cheap
        # elementwise FLOPs for HBM traffic on a memory-bound step.
        self.remat = bool(remat)

        self._train_step = None
        self._train_multi = None
        self._eval_step = None

    # ---- state ---------------------------------------------------------

    def create_state(self, sample_audio: np.ndarray) -> TrainState:
        # jit the initializer: eager init dispatches hundreds of tiny ops to
        # the device one by one (minutes on a remote TPU); compiled it is one
        # program.
        init_fn = jax.jit(
            lambda rngs, x: self.model.init(rngs, x, train=False)
        )
        if isinstance(sample_audio, (tuple, list)):
            # (q, scale) framed-int8 entry (frontend_precision: int8)
            sample = tuple(jnp.asarray(s[:1]) for s in sample_audio)
        else:
            sample = jnp.asarray(sample_audio[:1])
        variables = init_fn(
            {"params": self.base_key, "dropout": self.base_key}, sample,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        ema = None
        if self.use_ema:
            ema = ema_init(params, num_updates=int(self.ema_config.get("num_updates", 0)))
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            ema=ema, step=jnp.asarray(0, jnp.int32),
        )
        if self.mesh is not None:
            replicated = NamedSharding(self.mesh, P())
            state = jax.device_put(state, replicated)
        return state

    # ---- jitted steps --------------------------------------------------

    def _build_steps(self):
        model, loss_fn = self.model, self.loss_fn
        use_ema = self.use_ema
        ema_momentum = float(self.ema_config.get("momentum", 0.002))
        ema_n = int(self.ema_config.get("N", 2000))
        base_key = self.base_key

        def metrics_vector(metrics: Dict[str, jax.Array]) -> jax.Array:
            # one (10,) device buffer instead of ten scalars: a remote host
            # pays a full round trip per fetched buffer, so per-scalar metric
            # fetches cost seconds per epoch through a tunnelled runtime
            return jnp.stack([metrics[k] for k in METRIC_KEYS])

        def train_step(state: TrainState, audio, targets):
            rng = jax.random.fold_in(base_key, state.step)

            def compute_loss(params):
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    audio,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                loss, metrics = loss_fn(preds, targets)
                return loss, (metrics, mutated["batch_stats"])

            if self.remat:
                compute_loss_ = jax.checkpoint(
                    compute_loss,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "ayt_tape"
                    ),
                )
            else:
                compute_loss_ = compute_loss
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                compute_loss_, has_aux=True
            )(state.params)
            updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_ema = state.ema
            if use_ema:
                new_ema = ema_update(state.ema, new_params, ema_momentum, ema_n)
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                ema=new_ema,
                step=state.step + 1,
            )
            return new_state, metrics_vector(metrics)

        def eval_step(state: TrainState, audio, targets):
            params = state.ema.params if use_ema else state.params
            preds = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                audio,
                train=False,
            )
            _, metrics = loss_fn(preds, targets)
            return metrics_vector(metrics)

        s = self.steps_per_dispatch

        def train_multi(state, *flat):
            # S sequential optimizer steps in one compiled program (one host
            # dispatch); batches arrive as S separate device buffers, so no
            # host- or device-side stacking copy is ever made
            ms = []
            for i in range(s):
                state, m = train_step(state, flat[2 * i], flat[2 * i + 1])
                ms.append(m)
            return state, jnp.stack(ms)  # (S, 10)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P(self.data_axis))
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, data, data),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(repl, data, data), out_shardings=repl
            )
            if s > 1:
                self._train_multi = jax.jit(
                    train_multi,
                    in_shardings=(repl,) + (data,) * (2 * s),
                    out_shardings=(repl, repl),
                    donate_argnums=(0,),
                )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)
            if s > 1:
                self._train_multi = jax.jit(train_multi, donate_argnums=(0,))

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        """Explicit async host->device transfer. Never hand numpy straight to
        the jitted step: the implicit per-argument transfer path is
        synchronous and ~30x slower through a remote device tunnel (measured:
        4.2 s vs 0.15 s for a 32-clip fp32 batch)."""
        audio = batch["audio"]
        keys = ("classes", "centers", "widths", "valid")
        targets = {k: batch[k] for k in keys}
        if "clip_valid" in batch:  # pad-mode loader: mask repeat-padded clips
            targets["clip_valid"] = batch["clip_valid"]
        if self.mesh is not None:
            data = NamedSharding(self.mesh, P(self.data_axis))
            if any(
                d.process_index != jax.process_index()
                for d in self.mesh.devices.flat
            ):
                # multi-host mesh: each process holds only its 1/process_count
                # slice of the global batch (BatchLoader shard=...); a plain
                # device_put would treat the local array as the GLOBAL value
                # and silently keep only this host's rows of it
                put = lambda x: jax.make_array_from_process_local_data(data, x)
            else:
                put = lambda x: jax.device_put(x, data)
            audio = put(audio)
            targets = {k: put(v) for k, v in targets.items()}
        else:
            audio = jax.device_put(audio)
            targets = jax.device_put(targets)
        return audio, targets

    def _device_prefetch(self, loader: Iterable[Dict[str, np.ndarray]]):
        """Iterate device-resident batches one transfer ahead: device_put is
        async, so the next batch streams over while the current step runs."""
        it = iter(loader)
        try:
            nxt = self._put_batch(next(it))
        except StopIteration:
            return
        for batch in it:
            cur, nxt = nxt, self._put_batch(batch)
            yield cur
        yield nxt

    # ---- epoch loops ---------------------------------------------------

    def train(self, state: TrainState, loader: Iterable[Dict[str, np.ndarray]], verbose: bool = False):
        if self._train_step is None:
            self._build_steps()
        collected: List[jax.Array] = []
        s = self.steps_per_dispatch
        pending: List[Any] = []
        for audio, targets in self._device_prefetch(loader):
            if s > 1:
                pending.append((audio, targets))
                if len(pending) == s:
                    flat = [x for ab in pending for x in ab]
                    state, ms = self._train_multi(state, *flat)
                    collected.append(ms)  # (S, 10)
                    pending = []
            else:
                state, metrics = self._train_step(state, audio, targets)
                collected.append(metrics)
        for audio, targets in pending:  # epoch tail shorter than S
            state, metrics = self._train_step(state, audio, targets)
            collected.append(metrics)
        epoch_metrics = self._reduce(collected)
        self._train_metrics.append(epoch_metrics)
        if verbose:
            self._log("train", epoch_metrics)
        return state, epoch_metrics

    def evaluate(self, state: TrainState, loader: Iterable[Dict[str, np.ndarray]], verbose: bool = False):
        if self._eval_step is None:
            self._build_steps()
        collected: List[jax.Array] = []
        for audio, targets in self._device_prefetch(loader):
            collected.append(self._eval_step(state, audio, targets))
        epoch_metrics = self._reduce(collected)
        self._eval_metrics.append(epoch_metrics)
        if verbose:
            self._log("eval", epoch_metrics)
        return epoch_metrics

    def set_learning_rate(self, state: TrainState, lr: float) -> TrainState:
        """Rewrite the plateau-injected LR hyperparameter in the optimizer
        state (host-side; the compiled step is reused — same leaf shapes).
        Used with ``optim.ReduceLROnPlateau`` between epochs."""
        from .optim import set_opt_learning_rate

        return state.replace(opt_state=set_opt_learning_rate(state.opt_state, lr))

    @staticmethod
    def _reduce(collected: List[jax.Array]) -> Dict[str, float]:
        """(n_batches, 10) metric vectors -> epoch-mean dict; a single stacked
        device array means exactly one device->host fetch per epoch."""
        if not collected:
            return {k: float("nan") for k in METRIC_KEYS}
        rows = [m if m.ndim == 2 else m[None] for m in collected]  # multi-step
        arr = np.asarray(jnp.concatenate(rows, axis=0), dtype=np.float64)
        means = arr.mean(axis=0)
        return {k: float(means[i]) for i, k in enumerate(METRIC_KEYS)}

    @staticmethod
    def _log(mode: str, metrics: Dict[str, float]):
        ts = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        body = "\t".join(f"{k.replace('_', ' ')}: {v:.4f}" for k, v in metrics.items())
        print(f"[{ts}] [{mode.title()}]: {body}")

    # ---- checkpointing -------------------------------------------------

    # Bounded LRU: long-lived processes checkpointing trees of varying
    # shapes (several models/configs in one session, test suites) would
    # otherwise accumulate jitted packer closures + compiled programs forever.
    _packer_cache: "OrderedDict[Any, Any]" = OrderedDict()
    _PACKER_CACHE_MAX = 16

    @classmethod
    def fetch_tree(cls, tree):
        """Device->host fetch of a whole pytree in O(dtypes) round trips.

        ``np.asarray`` per leaf costs a full network round trip per tensor on
        a remote-tunnelled device (~0.4 s each here — hundreds of leaves in a
        checkpoint made every save cost tens of seconds). Instead, concatenate
        all same-dtype leaves into one device buffer inside one compiled
        program, fetch that, and split on host."""
        leaves, treedef = jax.tree.flatten(tree)
        out: List[Any] = [None] * len(leaves)
        groups: Dict[Any, List[int]] = {}
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, jax.Array):
                if not leaf.is_fully_addressable:
                    # multi-host global array: training state is replicated
                    # (P()), so any local shard holds the complete value.
                    # Re-root on a local shard so the packer jit below is a
                    # purely local program — jitting over the global mesh
                    # would be a cross-process collective, deadlocking when
                    # only the coordinator process checkpoints.
                    if not leaf.is_fully_replicated:
                        raise ValueError(
                            "fetch_tree on a multi-host array that is not fully "
                            "replicated; gather it explicitly first"
                        )
                    leaf = leaf.addressable_data(0)
                    leaves[i] = leaf
                groups.setdefault(jnp.asarray(leaf).dtype, []).append(i)
            else:
                out[i] = leaf
        for dt, idxs in groups.items():
            shapes = tuple(leaves[i].shape for i in idxs)
            key = (dt, shapes)
            packer = cls._packer_cache.get(key)
            if packer is None:
                packer = jax.jit(lambda *ls: jnp.concatenate([l.ravel() for l in ls]))
                cls._packer_cache[key] = packer
                while len(cls._packer_cache) > cls._PACKER_CACHE_MAX:
                    cls._packer_cache.popitem(last=False)
            else:
                cls._packer_cache.move_to_end(key)
            flat = np.asarray(packer(*[leaves[i] for i in idxs]))
            pos = 0
            for i, shape in zip(idxs, shapes):
                n = int(np.prod(shape, dtype=np.int64))
                out[i] = flat[pos : pos + n].reshape(shape)
                pos += n
        return jax.tree.unflatten(treedef, out)

    @classmethod
    def _atomic_write(cls, path: str, payload) -> None:
        if jax.process_index() != 0:
            # multi-host run: state is replicated, so N hosts writing the
            # same checkpoint to a shared filesystem would race on the temp
            # file and redundantly fetch the full state. Only the coordinator
            # writes; fetch_tree is collective-free (local-shard fetch), so
            # skipping it here cannot deadlock the other processes.
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.msgpack_serialize(cls.fetch_tree(payload))
        # pid-unique temp name: even two coordinators of unrelated runs
        # sharing a path never clobber each other's in-flight write
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic: a crash never leaves a torn file
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def save_model(self, state: TrainState, path: Optional[str] = None):
        """Persist the best-model artifact; EMA params are saved as the network
        params when EMA is enabled (reference ``pipeline/_trainer.py:38-47``)."""
        path = path or self.saved_model_path
        params = state.ema.params if (self.use_ema and state.ema is not None) else state.params
        payload = {
            "params": serialization.to_state_dict(params),
            "batch_stats": serialization.to_state_dict(state.batch_stats),
            "opt_state": serialization.to_state_dict(state.opt_state),
            "step": int(state.step),
        }
        self._atomic_write(path, payload)

    # full-state checkpoint: everything needed to resume mid-run (the
    # reference saves opt state but has no resume path — SURVEY.md §5)
    @property
    def resume_checkpoint_path(self) -> str:
        return os.path.join(self.model_path, "checkpoint.msgpack")

    def save_checkpoint(self, state: TrainState, epoch: int, best_loss: float,
                        path: Optional[str] = None,
                        extra: Optional[Dict[str, Any]] = None):
        """``extra``: small host-side auxiliary state (e.g. the
        ReduceLROnPlateau controller's counters) carried alongside the tree;
        surfaced after ``load_checkpoint`` as ``self.checkpoint_extra``."""
        payload = {
            "params": serialization.to_state_dict(state.params),
            "batch_stats": serialization.to_state_dict(state.batch_stats),
            "opt_state": serialization.to_state_dict(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
            "best_loss": float(best_loss),
            "train_metrics": self._train_metrics,
            "eval_metrics": self._eval_metrics,
        }
        if state.ema is not None:
            payload["ema_params"] = serialization.to_state_dict(state.ema.params)
            payload["ema_num_updates"] = int(state.ema.num_updates)
        if extra:
            payload["extra"] = dict(extra)
        self._atomic_write(path or self.resume_checkpoint_path, payload)

    def load_checkpoint(self, state: TrainState, path: Optional[str] = None):
        """Returns ``(state, next_epoch, best_loss)`` and restores the metric
        history so CSV/plot exports stay continuous across the resume."""
        path = path or self.resume_checkpoint_path
        if not os.path.exists(path):
            raise OSError(f"no resume checkpoint at {path}")
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        ema = state.ema
        if ema is not None and "ema_params" in payload:
            ema = EMAState(
                params=serialization.from_state_dict(state.ema.params, payload["ema_params"]),
                num_updates=jnp.asarray(payload.get("ema_num_updates", 0), jnp.int32),
            )
        new_state = state.replace(
            params=serialization.from_state_dict(state.params, payload["params"]),
            batch_stats=serialization.from_state_dict(state.batch_stats, payload["batch_stats"]),
            opt_state=serialization.from_state_dict(state.opt_state, payload["opt_state"]),
            ema=ema,
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )
        self._train_metrics = [dict(m) for m in payload.get("train_metrics", [])]
        self._eval_metrics = [dict(m) for m in payload.get("eval_metrics", [])]
        self.checkpoint_extra = payload.get("extra")
        return new_state, int(payload.get("epoch", -1)) + 1, float(payload.get("best_loss", np.inf))

    def load_model(self, state: TrainState, path: Optional[str] = None) -> TrainState:
        path = path or self.saved_model_path
        if not os.path.exists(path):
            raise OSError(f"model is yet to be saved in path: {path}")
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        params = serialization.from_state_dict(state.params, payload["params"])
        batch_stats = serialization.from_state_dict(state.batch_stats, payload["batch_stats"])
        opt_state = serialization.from_state_dict(state.opt_state, payload["opt_state"])
        return state.replace(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )

    # ---- observability -------------------------------------------------

    def metrics_to_csv(self):
        if jax.process_index() != 0:
            return  # metric history is identical on every host; one writer
        import pandas as pd

        os.makedirs(self.metrics_path, exist_ok=True)
        pd.DataFrame(self._train_metrics).to_csv(
            os.path.join(self.metrics_path, "train_metrics.csv"), index=False
        )
        pd.DataFrame(self._eval_metrics).to_csv(
            os.path.join(self.metrics_path, "eval_metrics.csv"), index=False
        )

    def save_metrics_plots(self, figsize=(25, 10)):
        if jax.process_index() != 0:
            return
        for mode in ("train", "eval"):
            self._save_plot(mode, figsize)

    def _save_plot(self, mode: str, figsize):
        import matplotlib

        matplotlib.use("Agg")
        import pandas as pd
        from matplotlib import pyplot as plt

        df = pd.DataFrame(getattr(self, f"_{mode}_metrics"))
        if df.empty:
            return
        fig, axs = plt.subplots(len(df.columns), 1, figsize=figsize)
        if len(df.columns) == 1:
            axs = [axs]
        for i, col in enumerate(df.columns):
            label = col.replace("_", " ").title()
            axs[i].plot(df[col].to_numpy())
            axs[i].grid(visible=True)
            axs[i].set_xlabel("Epoch")
            axs[i].set_ylabel(label)
            axs[i].set_title(f"[{mode.title()}] {label} vs Epoch")
        os.makedirs(self.metrics_path, exist_ok=True)
        fig.savefig(os.path.join(self.metrics_path, f"{mode}_metrics_plot.jpg"))
        plt.close(fig)
