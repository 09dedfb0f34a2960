"""Main training loop.

Behavioral reference: ``demucs/solver.py``. The per-batch work (augment ->
mix -> forward -> weighted loss -> grads -> clip -> optimizer -> batch-EMA)
is ONE jitted, data-parallel program; epoch orchestration, EMA-swap
validation, best-state tracking, periodic eval and atomic checkpointing stay
host-side and match the reference flow.
"""

from __future__ import annotations

import dataclasses
import logging
import pickle
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from demucs_tpu.evaluate import evaluate, new_sdr
from demucs_tpu.inference.apply import apply_model
from demucs_tpu.models.registry import Model
from demucs_tpu.train import distrib
from demucs_tpu.train.augment import AugmentConfig, make_augment
from demucs_tpu.train.config import TrainArgs
from demucs_tpu.train.ema import ModelEMA
from demucs_tpu.train.step import source_loss

logger = logging.getLogger(__name__)


def _merge_state(current: dict, source: tp.Mapping, path: str = "") -> dict:
    """torch ``load_state_dict(strict=False)`` over param pytrees: keys in
    both trees load from ``source`` (shape mismatch raises, like torch),
    keys only in ``current`` keep their values, extra ``source`` keys are
    ignored."""
    out: dict = {}
    for key, cur in current.items():
        name = f"{path}.{key}" if path else str(key)
        if key not in source:
            out[key] = cur
        elif isinstance(cur, dict):
            out[key] = _merge_state(cur, source[key], name)
        else:
            val = source[key]
            if np.shape(val) != np.shape(cur):
                raise ValueError(
                    f"size mismatch for {name}: checkpoint "
                    f"{np.shape(val)} vs model {np.shape(cur)}")
            out[key] = jnp.asarray(val)
    return out


def _summary(metrics):
    return " | ".join(f"{key.capitalize()}={val}" for key, val in metrics.items())


class MetricAverager:
    """Running average of metric dicts (demucs/utils.py:67-85, beta=1)."""

    def __init__(self):
        self.total: tp.Dict[str, float] = {}
        self.fix: tp.Dict[str, float] = {}

    def __call__(self, metrics: dict, weight: float = 1.0) -> dict:
        for key, value in metrics.items():
            self.total[key] = self.total.get(key, 0.0) + weight * float(value)
            self.fix[key] = self.fix.get(key, 0.0) + weight
        return {key: tot / self.fix[key] for key, tot in self.total.items()}


def make_optimizer(args: TrainArgs, model: Model) -> optax.GradientTransformation:
    """Adam/AdamW with the transformer's own lr/weight-decay group
    (train.py:75-106 + transformer.py:715-719 make_optim_group)."""
    opt = args.optim

    def base(lr: float, wd: float, clip: bool = True) -> optax.GradientTransformation:
        steps = []
        if opt.clip_grad and clip:
            steps.append(optax.clip_by_global_norm(opt.clip_grad))
        if opt.optim == "adam":
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps.append(optax.scale_by_adam(b1=opt.momentum, b2=opt.beta2))
            steps.append(optax.scale(-lr))
        elif opt.optim == "adamw":
            steps.append(optax.scale_by_adam(b1=opt.momentum, b2=opt.beta2))
            steps.append(optax.add_decayed_weights(wd))
            steps.append(optax.scale(-lr))
        else:
            raise ValueError(f"Invalid optimizer {opt.optim}")
        return optax.chain(*steps)

    t_lr = getattr(model.cfg, "t_lr", None)
    t_wd = getattr(model.cfg, "t_weight_decay", 0.0)
    if model.kind == "htdemucs" and (t_lr is not None or t_wd):
        def label_fn(params):
            return {
                key: ("transformer" if key == "crosstransformer" else "default")
                for key in params
            }

        grouped = optax.multi_transform(
            {
                "default": base(opt.lr, opt.weight_decay, clip=False),
                "transformer": base(t_lr if t_lr is not None else opt.lr, t_wd,
                                    clip=False),
            },
            label_fn,
        )
        if opt.clip_grad:
            # clip the GLOBAL norm over all parameters BEFORE the per-group
            # split (reference solver.py:378-381 clips model.parameters() as
            # one set; per-group clipping under-clips)
            return optax.chain(optax.clip_by_global_norm(opt.clip_grad), grouped)
        return grouped
    return base(opt.lr, opt.weight_decay)


class Solver:
    def __init__(self, loaders, model: Model, optimizer: optax.GradientTransformation,
                 args: TrainArgs, folder: tp.Union[str, Path]):
        self.args = args
        self.loaders = loaders
        self.model = model
        self.optimizer = optimizer
        self.opt_state = optimizer.init(model.params)
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)

        # Quantization-aware training (solver.py:339-342, states.py:23-47):
        # DiffQ learns per-group bit-depths via a logits pytree trained by its
        # own Adam; QAT applies fixed-bit STE. See train/quantize.py.
        from demucs_tpu.train import quantize as quantize_mod

        self._quant = quantize_mod.make_spec(args)
        self._qnames: tp.Tuple[str, ...] = ()
        self.qlogits = None
        if self._quant is not None:
            self._qnames = quantize_mod.quantized_param_names(
                model.kind, model.cfg, self._quant)
            if self._quant.mode == "diffq":
                self.qlogits = quantize_mod.init_logits(
                    model.params, self._qnames, self._quant)
                self._qopt = optax.adam(self._quant.logit_lr)
                self.opt_state = (optimizer.init(model.params),
                                  self._qopt.init(self.qlogits))

        # EMA banks (solver.py:41-50): batch EMAs update per step, epoch EMAs
        # per epoch. All live on device as pytrees.
        self.emas: tp.Dict[str, tp.List[ModelEMA]] = {"batch": [], "epoch": []}
        for kind in self.emas:
            for decay in getattr(args.ema, kind) or ():
                self.emas[kind].append(ModelEMA(model.params, decay))

        aug_cfg = AugmentConfig(
            shift=int(args.dset.samplerate * args.dset.shift),
            shift_same=args.augment.shift_same,
            flip=args.augment.flip,
            scale_proba=args.augment.scale.proba,
            scale_min=args.augment.scale.min,
            scale_max=args.augment.scale.max,
            remix_proba=args.augment.remix.proba,
            remix_group_size=args.augment.remix.group_size,
        )
        # scale/remix only with proba > 0 (solver.py:57-61)
        full = bool(args.augment.scale.proba or args.augment.remix.proba)
        self._augment = make_augment(aug_cfg, full=full)

        self.checkpoint_file = self.folder / "checkpoint.tpk"
        self.best_file = self.folder / "best.dmx"
        self.history: tp.List[dict] = []
        self.best_state = None
        self.best_changed = False
        self.rng = jax.random.PRNGKey(args.seed)

        self._mesh = self._make_mesh()
        self._train_step = self._build_train_step()
        self._valid_step = self._build_valid_step()
        self._reset()

    def _make_mesh(self):
        """Data-parallel mesh for the train step (the DDP replacement,
        SURVEY.md §2.10): batch sharded over every usable device, params
        replicated, XLA inserts the gradient all-reduce. None = single
        device (or indivisible batch on one process)."""
        from jax.sharding import Mesh

        # devices of the platform training actually runs on (jax_default_device
        # may pin CPU while an accelerator plugin owns jax.devices())
        default = jax.config.jax_default_device
        devs = jax.devices(default.platform) if default is not None else jax.devices()
        if len(devs) == 1:
            return None
        batch = getattr(self.loaders.get("train"), "batch_size", None)
        if not batch:
            return None
        if jax.process_count() > 1:
            d_local = len(jax.local_devices())
            if batch % d_local != 0:
                raise ValueError(
                    f"per-process batch {batch} must divide the {d_local} "
                    "local devices for multi-host data-parallel training")
            return Mesh(np.array(devs), axis_names=("dp",))
        # single process: largest device count that divides the batch
        m = max((k for k in range(1, len(devs) + 1) if batch % k == 0),
                default=1)
        if m == 1:
            return None
        return Mesh(np.array(devs[:m]), axis_names=("dp",))

    def _jit_train_step(self, step):
        if self._mesh is None:
            return jax.jit(step)
        from demucs_tpu.train.step import data_parallel_shardings

        repl, batch_sharded = data_parallel_shardings(self._mesh)
        return jax.jit(step,
                       in_shardings=(repl, repl, batch_sharded, repl),
                       out_shardings=(repl, repl, repl))

    def _put_batch(self, sources):
        if self._mesh is None:
            return jnp.asarray(sources)
        from demucs_tpu.train.step import (
            data_parallel_shardings, put_global_batch)

        _, batch_sharded = data_parallel_shardings(self._mesh)
        return put_global_batch(batch_sharded, np.asarray(sources))

    # ------------------------------------------------------------------ steps

    def _build_train_step(self):
        args = self.args
        model = self.model
        forward = model_forward_fn(model.kind)
        weights = jnp.asarray(args.weights, dtype=jnp.float32)
        augment = self._augment
        optimizer = self.optimizer

        fwd = forward
        if args.remat:
            import functools as _ft

            fwd = jax.checkpoint(
                _ft.partial(forward, cfg=model.cfg, train=True),
                static_argnums=(),
            )

        def loss_fn(params, sources, rng):
            mix = sources.sum(axis=1)
            if args.remat:
                estimate = fwd(params, mix, rng=rng)
            else:
                estimate = forward(params, mix, model.cfg, train=True, rng=rng)
            assert estimate.shape == sources.shape, (estimate.shape, sources.shape)
            loss, reco = source_loss(estimate, sources, args.optim.loss, weights)
            return loss, reco

        quant = self._quant
        qnames = self._qnames
        from demucs_tpu.train import quantize as quantize_mod

        qat_ms = 0.0
        if quant is not None and quant.mode == "qat":
            flat = quantize_mod._flatten(self.model.params)
            qat_ms = float(sum(int(np.prod(np.shape(flat[n]))) for n in qnames)
                           * quant.bits / 8.0 / 2.0**20)

        def make_step(with_svd: bool):
            def full_loss(params, qlogits, sources, rng, svd_key, noise_key):
                p = params
                ms = 0.0
                if quant is not None and quant.mode == "diffq":
                    p = quantize_mod.noisy_params(params, qlogits, noise_key, quant)
                    ms = quantize_mod.model_size_mb(qlogits, quant)
                elif quant is not None:  # fixed-bit QAT (STE)
                    p = quantize_mod.ste_params(params, qnames, quant)
                    ms = qat_ms  # constant size, logged like the reference's
                loss, reco = loss_fn(p, sources, rng)
                penalty = 0.0
                if with_svd:
                    from demucs_tpu.train.svd import convtr_names_for, svd_total

                    kw = dataclasses.asdict(args.svd)
                    kw.pop("penalty")
                    # The host-side rng (in the dispatch below) decides the
                    # skip — svd_total is the trace-safe core — but the
                    # reference still unbiases the fired penalty by 1/proba
                    # (svd.py:83 returns total / proba) so the expected
                    # per-batch regularization is proba-invariant.
                    fire_proba = kw.pop("proba")
                    penalty = svd_total(
                        params, key=svd_key,
                        convtr_names=convtr_names_for(self.model), **kw,
                    ) / fire_proba
                    loss = loss + args.svd.penalty * penalty
                if quant is not None and quant.mode == "diffq":
                    # model-size term (reference solver.py:339-342)
                    loss = loss + quant.penalty * ms
                return loss, (reco, penalty, ms)

            if quant is not None and quant.mode == "diffq":
                qopt = self._qopt

                def step(carry, opt_states, sources, rng):
                    params, qlogits = carry["model"], carry["qlogits"]
                    k_aug, k_model, k_svd, k_noise = jax.random.split(rng, 4)
                    sources = augment(k_aug, sources)
                    (loss, (reco, penalty, ms)), grads = jax.value_and_grad(
                        full_loss, argnums=(0, 1), has_aux=True)(
                        params, qlogits, sources, k_model, k_svd, k_noise)
                    g_model, g_logits = grads
                    grad_norm = optax.global_norm(g_model)
                    m_state, q_state = opt_states
                    updates, m_state = optimizer.update(g_model, m_state, params)
                    params = optax.apply_updates(params, updates)
                    q_up, q_state = qopt.update(g_logits, q_state, qlogits)
                    qlogits = optax.apply_updates(qlogits, q_up)
                    metrics = {"loss": loss, "reco_per_source": reco,
                               "grad": grad_norm, "ms": ms}
                    if with_svd:
                        metrics["penalty"] = penalty
                    return ({"model": params, "qlogits": qlogits},
                            (m_state, q_state), metrics)

                return step

            def step(params, opt_state, sources, rng):
                k_aug, k_model, k_svd, k_noise = jax.random.split(rng, 4)
                sources = augment(k_aug, sources)
                (loss, (reco, penalty, ms)), grads = jax.value_and_grad(
                    full_loss, has_aux=True)(params, None, sources, k_model,
                                             k_svd, k_noise)
                grad_norm = optax.global_norm(grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics = {"loss": loss, "reco_per_source": reco, "grad": grad_norm}
                if quant is not None:
                    metrics["ms"] = ms
                if with_svd:
                    metrics["penalty"] = penalty
                return params, opt_state, metrics

            return step

        # NOTE: no buffer donation here — EMA banks and best_state alias the live
        # param arrays; donation would invalidate them. The perf-critical path
        # is inference; revisit with explicit copies if train memory binds.
        plain = self._jit_train_step(make_step(False))
        if args.svd.penalty > 0:
            penalized = self._jit_train_step(make_step(True))
            from demucs_tpu.train.svd import penalty_rng

            def dispatch(params, opt_state, sources, rng):
                # Shared seeded RNG so all DP workers skip together (svd.py:26-28).
                if penalty_rng.random() <= args.svd.proba:
                    return penalized(params, opt_state, sources, rng)
                return plain(params, opt_state, sources, rng)

            return dispatch
        return plain

    def _build_valid_step(self):
        args = self.args
        model = self.model
        forward = model_forward_fn(model.kind)
        weights = jnp.asarray(args.weights, dtype=jnp.float32)

        def step(params, mix, sources):
            estimate = forward(params, mix, model.cfg, train=False, rng=None)
            loss, reco = source_loss(estimate, sources, args.optim.loss, weights)
            return loss, reco, estimate

        return jax.jit(step)

    # ------------------------------------------------------------ persistence

    @property
    def params(self):
        return self.model.params

    @params.setter
    def params(self, value):
        self.model.params = value

    def _valid_params(self):
        """Validation weights under QAT: hard-quantized at the learned
        (diffq) or fixed (qat) bit-depths."""
        from demucs_tpu.train import quantize as quantize_mod

        if self._quant is None:
            return self.model.params
        if self._quant.mode == "diffq":
            return quantize_mod.eval_params(self.model.params, self.qlogits,
                                            self._quant)
        return quantize_mod.ste_params(self.model.params, self._qnames,
                                       self._quant)

    def quantized_state(self) -> dict:
        """Export: hard-quantized ``__quantized`` container for the CURRENT
        params (decoder-compatible; tools/export.py uses this when the XP
        trained with quant.diffq/qat — reference states.py:96-107)."""
        from demucs_tpu.train import quantize as quantize_mod

        assert self._quant is not None, "quantization not enabled on this XP"
        return quantize_mod.hard_quantized_state(
            self.model.params, self.qlogits, self._quant, self.model.kind,
            self.model.cfg)

    def _serialize(self, epoch: int) -> None:
        """Atomic full-state checkpoint (solver.py:77-101).

        With ``misc.async_checkpoint`` the device->host fetch + pickle +
        atomic rename run in a background thread (~20-30 s/epoch of relay
        fetch at released width overlapped with the next epoch's compute —
        measured in the r5 on-chip overfit run). JAX arrays are immutable,
        so capturing this epoch's pytree references is a consistent
        snapshot; only one writer is in flight (joined before the next
        checkpoint and at the end of ``train``)."""
        # snapshot references NOW (the loop replaces self.model.params /
        # self.opt_state with new arrays each step)
        refs = dict(
            params=self.model.params,
            opt_state=self.opt_state,
            history=[dict(m) for m in self.history],
            best_state=self.best_state,
            rng=self.rng,
            qlogits=self.qlogits,
            emas={kind: [(ema.state, ema.count) for ema in emas]
                  for kind, emas in self.emas.items()},
            best_changed=self.best_changed,
        )
        self.best_changed = False
        if getattr(self.args.misc, "async_checkpoint", False):
            import threading

            self._join_checkpoint_writer()
            self._ckpt_thread = threading.Thread(
                target=self._write_checkpoint, args=(epoch, refs),
                name="checkpoint-writer", daemon=False)
            self._ckpt_thread.start()
        else:
            self._write_checkpoint(epoch, refs)

    def _join_checkpoint_writer(self) -> None:
        thread = getattr(self, "_ckpt_thread", None)
        if thread is not None:
            thread.join()
            self._ckpt_thread = None

    def _write_checkpoint(self, epoch: int, refs: dict) -> None:
        def to_host(tree):
            return jax.tree.map(np.asarray, tree)

        package = {
            "state": to_host(refs["params"]),
            "optimizer": to_host(refs["opt_state"]),
            "history": refs["history"],
            "best_state": (to_host(refs["best_state"])
                           if refs["best_state"] is not None else None),
            "args": dataclasses.asdict(self.args),
            "rng": np.asarray(refs["rng"]),
        }
        if refs["qlogits"] is not None:
            package["qlogits"] = to_host(refs["qlogits"])
        for kind, emas in refs["emas"].items():
            for k, (state, count) in enumerate(emas):
                package[f"ema_{kind}_{k}"] = {
                    "state": to_host(state), "count": count}
        tmp = self.checkpoint_file.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(package, f)
        tmp.rename(self.checkpoint_file)

        save_every = self.args.save_every
        if save_every and (epoch + 1) % save_every == 0 and epoch + 1 != self.args.epochs:
            periodic = self.folder / f"checkpoint_{epoch + 1}.tpk"
            tmp = periodic.with_suffix(".tmp")
            with open(tmp, "wb") as f:
                pickle.dump(package, f)
            tmp.rename(periodic)

        if refs["best_changed"] and refs["best_state"] is not None:
            from demucs_tpu.zoo.native import save_model

            best_model = Model(self.model.kind, self.model.cfg,
                               refs["best_state"])
            save_model(best_model, self.best_file,
                       training_args=dataclasses.asdict(self.args))

    def _reset(self) -> None:
        """Resume from checkpoint / warm starts (solver.py:103-132)."""
        if self.checkpoint_file.exists():
            logger.info("Loading checkpoint model: %s", self.checkpoint_file)
            with open(self.checkpoint_file, "rb") as f:
                package = pickle.load(f)
            self.model.params = jax.tree.map(jnp.asarray, package["state"])
            self.opt_state = jax.tree.map(
                lambda ref, v: jnp.asarray(v) if isinstance(v, np.ndarray) else v,
                self.opt_state, package["optimizer"],
            )
            self.history[:] = package["history"]
            if package.get("best_state") is not None:
                self.best_state = jax.tree.map(jnp.asarray, package["best_state"])
            if package.get("qlogits") is not None:
                self.qlogits = jax.tree.map(jnp.asarray, package["qlogits"])
            self.rng = jnp.asarray(package["rng"])
            for kind, emas in self.emas.items():
                for k, ema in enumerate(emas):
                    saved = package[f"ema_{kind}_{k}"]
                    ema.state = jax.tree.map(jnp.asarray, saved["state"])
                    ema.count = saved["count"]
        elif self.args.continue_pretrained:
            from demucs_tpu.zoo.pretrained import get_model

            pre = get_model(name=self.args.continue_pretrained,
                            repo=self.args.pretrained_repo)
            self.model.params = pre.params
        elif self.args.continue_from:
            cf = self.folder.parent / str(self.args.continue_from) / "checkpoint.tpk"
            logger.info("Loading from %s", cf)
            with open(cf, "rb") as f:
                package = pickle.load(f)
            if package.get("best_state") is not None:
                self.best_state = jax.tree.map(jnp.asarray, package["best_state"])
            source = package["best_state"] if self.args.continue_best else package["state"]
            # load_state_dict(strict=False) semantics (reference
            # solver.py:128-130): intersecting keys load, missing/extra keys
            # are tolerated (fine-tune variants may add/remove submodules),
            # shape mismatches still error like torch does.
            self.model.params = _merge_state(self.model.params, source)
            if self.args.continue_opt:
                self.opt_state = jax.tree.map(
                    lambda ref, v: jnp.asarray(v) if isinstance(v, np.ndarray) else v,
                    self.opt_state, package["optimizer"],
                )

    # ------------------------------------------------------------------- loop

    def _format_train(self, metrics: dict) -> dict:
        losses = {
            "loss": format(metrics["loss"], ".4f"),
            "reco": format(metrics["reco"], ".4f"),
        }
        for key in ("nsdr", "grad", "ms", "penalty", "best", "bname"):
            if key in metrics:
                val = metrics[key]
                losses[key] = val if isinstance(val, str) else format(val, ".4f")
        return losses

    def _format_test(self, metrics: dict) -> dict:
        losses = {}
        for key in ("sdr", "nsdr"):
            if key in metrics:
                losses[key] = format(metrics[key], ".3f")
        for source in self.model.sources:
            for prefix in ("sdr", "nsdr"):
                key = f"{prefix}_{source}"
                if key in metrics:
                    losses[key] = format(metrics[key], ".3f")
        return losses

    def train(self) -> None:
        """Epoch loop (solver.py:172-289)."""
        for epoch, metrics in enumerate(self.history):
            logger.info("Replay | Epoch %d | %s", epoch + 1,
                        _summary(self._format_train(metrics["train"])))

        for epoch in range(len(self.history), self.args.epochs):
            metrics: tp.Dict[str, tp.Any] = {}
            logger.info("-" * 70)
            logger.info("Training...")
            metrics["train"] = self._run_one_epoch(epoch)
            logger.info("Train Summary | Epoch %d | %s", epoch + 1,
                        _summary(self._format_train(metrics["train"])))

            logger.info("Cross validation...")
            valid = self._run_one_epoch(epoch, train=False)
            bvalid = valid
            bname = "main"
            state = self.model.params
            metrics["valid"] = {"main": valid}
            key = self.args.test.metric
            for kind, emas in self.emas.items():
                for k, ema in enumerate(emas):
                    old = self.model.params
                    self.model.params = ema.state
                    try:
                        v = self._run_one_epoch(epoch, train=False)
                    finally:
                        self.model.params = old
                    name = f"ema_{kind}_{k}"
                    metrics["valid"][name] = v
                    a, b = v[key], bvalid[key]
                    if key.startswith("nsdr"):
                        a, b = -a, -b
                    if a < b:
                        bvalid = v
                        state = ema.state
                        bname = name
            metrics["valid"].update(bvalid)
            metrics["valid"]["bname"] = bname

            valid_loss = metrics["valid"][key]
            history_vals = [m["valid"][key] for m in self.history] + [valid_loss]
            best_loss = max(history_vals) if key.startswith("nsdr") else min(history_vals)
            metrics["valid"]["best"] = best_loss
            if self.args.svd.penalty > 0:
                # reference logs the exact-SVD penalty each valid epoch
                # (solver.py:237-242), including its stochastic proba skip
                from demucs_tpu.train.svd import convtr_names_for, svd_penalty

                kw = dataclasses.asdict(self.args.svd)
                kw.pop("penalty")
                metrics["valid"]["penalty"] = float(svd_penalty(
                    self.model.params, exact=True,
                    convtr_names=convtr_names_for(self.model), **kw))
            logger.info("Valid Summary | Epoch %d | %s", epoch + 1,
                        _summary(self._format_train(metrics["valid"])))

            if valid_loss == best_loss or self.args.dset.train_valid:
                logger.info("New best valid loss %.4f", valid_loss)
                self.best_state = jax.tree.map(lambda x: x, state)
                self.best_changed = True

            should_eval = (epoch + 1) % self.args.test.every == 0
            is_last = epoch == self.args.epochs - 1
            if (should_eval or is_last) and self.args.dset.musdb:
                logger.info("Evaluating on the test set...")
                eval_state = self.best_state if (self.args.test.best and
                                                 self.best_state is not None) \
                    else self.model.params
                compute_sdr = self.args.test.sdr and is_last
                old = self.model.params
                self.model.params = eval_state
                try:
                    metrics["test"] = evaluate(self, compute_sdr=compute_sdr)
                finally:
                    self.model.params = old
                logger.info("Test Summary | Epoch %d | %s", epoch + 1,
                            _summary(self._format_test(metrics["test"])))

            self.history.append(metrics)
            self._push_history()
            if distrib.rank() == 0:
                self._serialize(epoch)
            if is_last:
                break
        # async_checkpoint: the final epoch's writer must finish before
        # train() returns (callers may read/copy the checkpoint right away)
        self._join_checkpoint_writer()

    def _push_history(self) -> None:
        # Only rank 0 owns the XP folder files (reference solver.py:284-287);
        # concurrent tmp->rename from several ranks races.
        if distrib.rank() != 0:
            return
        import json

        def clean(obj):
            if isinstance(obj, dict):
                return {k: clean(v) for k, v in obj.items()}
            if isinstance(obj, (np.floating, np.integer)):
                return float(obj)
            if isinstance(obj, (jnp.ndarray, np.ndarray)):
                return float(obj)
            return obj

        path = self.folder / "history.json"
        tmp = path.with_suffix(".tmp")
        json.dump(clean(self.history), open(tmp, "w"), indent=1)
        tmp.rename(path)

    def _run_one_epoch(self, epoch: int, train: bool = True) -> dict:
        """Per-batch loop (solver.py:291-405)."""
        args = self.args
        data_loader = self.loaders["train"] if train else self.loaders["valid"]
        if train and hasattr(data_loader, "set_epoch"):
            data_loader.set_epoch(epoch)

        averager = MetricAverager()
        weights = np.asarray(args.weights, dtype=np.float64)
        losses: tp.Dict[str, float] = {}
        vmodel = self.model
        if not train and self._quant is not None:
            # QAT: validate the hard-quantized model (diffq applies true
            # quantization in its eval-mode forward pre-hook)
            vmodel = Model(self.model.kind, self.model.cfg, self._valid_params())
        idx = -1
        for idx, sources in enumerate(data_loader):
            if train:
                self.rng, key = jax.random.split(self.rng)
                if self.qlogits is not None:  # diffq: logits train alongside
                    carry = {"model": self.model.params, "qlogits": self.qlogits}
                    carry, self.opt_state, m = self._train_step(
                        carry, self.opt_state, self._put_batch(sources), key)
                    self.model.params = carry["model"]
                    self.qlogits = carry["qlogits"]
                else:
                    params, self.opt_state, m = self._train_step(
                        self.model.params, self.opt_state,
                        self._put_batch(sources), key,
                    )
                    self.model.params = params
                reco = np.asarray(m["reco_per_source"])
                losses = {
                    "loss": float(m["loss"]),
                    "grad": float(m["grad"]),
                }
                if "ms" in m:
                    losses["ms"] = float(m["ms"])
                if "penalty" in m:
                    # reference records the fired svd penalty per batch
                    # (solver.py:360 losses['penalty'])
                    losses["penalty"] = float(m["penalty"])
                for ema in self.emas["batch"]:
                    ema.update(self.model.params)
            else:
                mix = sources[:, 0]
                sources_only = sources[:, 1:]
                if args.valid_apply:
                    # reference solver.py:316 — apply_model defaults, i.e.
                    # shifts=1 (one random shift per valid track)
                    estimate = apply_model(
                        vmodel, mix, split=args.test.split, overlap=0, shifts=1
                    )
                    loss_j, reco = source_loss(
                        estimate, sources_only, args.optim.loss, weights)
                    loss = float(loss_j)
                    reco = np.asarray(reco)
                    losses = {"loss": loss}
                else:
                    loss, reco_j, estimate = self._valid_step(
                        vmodel.params, jnp.asarray(mix), jnp.asarray(sources_only)
                    )
                    estimate = np.asarray(estimate)
                    reco = np.asarray(reco_j)
                    losses = {"loss": float(loss)}
                nsdrs = new_sdr(np.asarray(sources_only), estimate).mean(axis=0)
                total = 0.0
                for source, nsdr, w in zip(self.model.sources, nsdrs, weights):
                    losses[f"nsdr_{source}"] = float(nsdr)
                    total += w * nsdr
                losses["nsdr"] = float(total / weights.sum())
            losses["reco"] = float((np.asarray(reco) * weights).sum() / weights.sum())
            for k, source in enumerate(self.model.sources):
                losses[f"reco_{source}"] = float(np.asarray(reco)[k])
            losses = averager(losses)
            # reference breaks when idx == max_batches AFTER processing it
            # (solver.py:396), i.e. max_batches+1 batches per epoch — the
            # published recipes' epoch contents depend on this quirk.
            if args.max_batches is not None and idx == args.max_batches:
                break
            if args.debug and train:
                break
            if args.flag == "debug":
                break
        if train:
            for ema in self.emas["epoch"]:
                ema.update(self.model.params)
        return distrib.average(losses, idx + 1)


def model_forward_fn(kind: str):
    if kind == "htdemucs":
        from demucs_tpu.models.htdemucs import forward
    elif kind == "hdemucs":
        from demucs_tpu.models.hdemucs import forward
    elif kind == "demucs":
        from demucs_tpu.models.demucs import forward
    else:
        raise ValueError(kind)
    return forward
