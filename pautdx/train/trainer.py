"""Generic pjit Trainer — the one training harness every model shares.

Replaces the reference's per-script epoch loops (SURVEY.md §1 L4) with a
single engine: jitted train/eval steps (donated state), data-parallel
sharding over a device mesh, AdamW with param groups, cosine or plateau
scheduling via runtime lr-scales, optional EMA, early stopping, per-epoch
orbax checkpoints (best/latest markers) and a crash-safe history JSON —
the reference's checkpoint contract (SURVEY.md §5.4).

The objective is a pure function ``objective(out, batch) -> (loss, aux)``;
the model is any flax module taking ``(signals, train=...)``. Batches are
dicts with at least ``"signals"`` and whatever the objective needs.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from pautdx.data.prefetch import prefetch_to_device
from pautdx.mesh import batch_sharding, replicated
from pautdx.train.checkpoint import CheckpointManager
from pautdx.train.optim import ReduceLROnPlateau, ema_update, scale_updates


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None


def _split_variables(variables):
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return params, batch_stats


class Trainer:
    def __init__(self, model, objective: Callable,
                 optimizer: optax.GradientTransformation,
                 *, mesh=None, checkpoint_dir: Optional[str] = None,
                 ema_decay: Optional[float] = None, seed: int = 0,
                 input_key: str = "signals", guard_nonfinite: bool = True,
                 prefetch: int = 2):
        self.model = model
        # double-buffered host->device input pipeline (the reference's
        # DataLoader(num_workers=4, pin_memory=True) analogue,
        # `D-Fine/temporal_dfine.py:259-266`); 0 disables
        self.prefetch = prefetch
        if guard_nonfinite:
            # numerical-safety net (SURVEY §5.2): a non-finite loss from a
            # bad batch becomes a constant surrogate instead of poisoning
            # the params — the reference's try/except-continue, jit-safe
            from pautdx.utils.debug import guarded

            objective = guarded(objective)
        self.objective = objective
        self.optimizer = optimizer
        self.mesh = mesh
        self.ema_decay = ema_decay
        self.seed = seed
        self.input_key = input_key
        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        self.history: Dict[str, list] = {}
        self._train_step = None
        self._eval_step = None

    # -- init -------------------------------------------------------------
    def init(self, example_batch: Dict[str, np.ndarray]) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        x = jnp.asarray(example_batch[self.input_key])
        variables = self.model.init({"params": rng}, x, train=False)
        params, batch_stats = _split_variables(variables)
        opt_state = self.optimizer.init(params)
        ema = params if self.ema_decay else None
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state,
                          ema_params=ema)

    # -- steps ------------------------------------------------------------
    def _build_steps(self):
        model, objective = self.model, self.objective
        optimizer, ema_decay = self.optimizer, self.ema_decay
        input_key = self.input_key

        def loss_fn(params, batch_stats, batch, rng):
            variables = {"params": params}
            has_bs = bool(jax.tree_util.tree_leaves(batch_stats))
            if has_bs:
                variables["batch_stats"] = batch_stats
            out, mutated = model.apply(
                variables, batch[input_key], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"] if has_bs else [])
            loss, aux = objective(out, batch)
            new_bs = mutated.get("batch_stats", batch_stats) if has_bs \
                else batch_stats
            return loss, (aux, new_bs)

        def train_step(state: TrainState, batch, lr_scale):
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                     state.step)
            grads, (aux, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            # numerical-safety net: a poisoned batch (NaN/inf loss or
            # grads) contributes a ZERO update instead of corrupting the
            # params — jit-safe version of the reference's
            # try/except-continue (SURVEY §5.2)
            finite = jnp.isfinite(optax.global_norm(updates))
            updates = scale_updates(
                jax.tree_util.tree_map(jnp.nan_to_num, updates),
                lr_scale * finite.astype(jnp.float32))
            # poisoned grads also corrupt optimizer moments: keep the old
            # optimizer state on a non-finite batch
            new_opt = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_opt,
                state.opt_state)
            # ... and the poisoned forward's BatchNorm batch statistics
            # would permanently write NaN into the running stats — gate
            # them with the same flag
            new_bs = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_bs,
                state.batch_stats)
            aux = dict(aux)
            aux["update_was_finite"] = finite.astype(jnp.float32)
            new_params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema_decay:
                ema = ema_update(ema, new_params, ema_decay)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   batch_stats=new_bs, opt_state=new_opt,
                                   ema_params=ema)
            aux["grad_norm"] = optax.global_norm(grads)
            return new_state, aux

        def eval_step(state: TrainState, batch):
            variables = {"params": state.params}
            if jax.tree_util.tree_leaves(state.batch_stats):
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, batch[input_key], train=False)
            loss, aux = objective(out, batch)
            aux = dict(aux)
            aux["loss"] = loss
            return aux, out

        if self.mesh is not None:
            repl = replicated(self.mesh)
            bsh = batch_sharding(self.mesh)
            self._train_step = jax.jit(
                train_step, donate_argnums=(0,),
                in_shardings=(repl, bsh, None),
                out_shardings=(repl, repl))
            self._eval_step = jax.jit(
                eval_step, in_shardings=(repl, bsh),
                out_shardings=(repl, repl))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)

    # -- loops ------------------------------------------------------------
    def _input_pipeline(self, batches: Iterable) -> Iterable:
        """Threaded host loading + double-buffered async device transfer:
        batch k+1's host->device copy is in flight while batch k's step
        runs, so the device never stalls on input."""
        if self.prefetch <= 0:
            return ({k: jnp.asarray(v) for k, v in b.items()}
                    for b in batches)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        return prefetch_to_device(batches, size=self.prefetch,
                                  sharding=sharding)

    def train_epoch(self, state: TrainState, batches: Iterable,
                    lr_scale: float = 1.0):
        if self._train_step is None:
            self._build_steps()
        losses = []
        scale = jnp.asarray(lr_scale, jnp.float32)
        for batch in self._input_pipeline(batches):
            state, aux = self._train_step(state, batch, scale)
            losses.append(aux)
        agg = {k: float(np.mean([np.asarray(l[k]) for l in losses]))
               for k in losses[0]} if losses else {}
        return state, agg

    def evaluate(self, state: TrainState, batches: Iterable,
                 collect: Optional[Callable] = None):
        if self._eval_step is None:
            self._build_steps()
        metrics, collected = [], []
        for batch in self._input_pipeline(batches):
            aux, out = self._eval_step(state, batch)
            metrics.append(aux)
            if collect is not None:
                collected.append(collect(out, batch))
        agg = {k: float(np.mean([np.asarray(m[k]) for m in metrics]))
               for k in metrics[0]} if metrics else {}
        return agg, collected

    def fit(self, state: TrainState, train_batches_fn: Callable[[], Iterable],
            val_batches_fn: Optional[Callable[[], Iterable]] = None,
            *, epochs: int = 10, plateau: Optional[ReduceLROnPlateau] = None,
            early_stop_patience: Optional[int] = None,
            metadata: Optional[Dict] = None,
            log: Callable[[str], None] = print):
        best_val = float("inf")
        bad = 0
        lr_scale = 1.0
        for epoch in range(epochs):
            t0 = time.time()
            state, train_m = self.train_epoch(state, train_batches_fn(),
                                              lr_scale)
            row = {"epoch": epoch, **{f"train_{k}": v
                                      for k, v in train_m.items()}}
            val_loss = None
            if val_batches_fn is not None:
                val_m, _ = self.evaluate(state, val_batches_fn())
                row.update({f"val_{k}": v for k, v in val_m.items()})
                val_loss = val_m.get("loss")
                if val_m.get("loss_was_finite", 1.0) < 1.0:
                    # the guarded objective substitutes a constant for
                    # non-finite losses — a diverged epoch must not
                    # masquerade as 'best' / feed plateau logic
                    val_loss = float("inf")
            row["lr_scale"] = lr_scale
            row["time_s"] = round(time.time() - t0, 3)
            for k, v in row.items():
                self.history.setdefault(k, []).append(v)
            log(f"[epoch {epoch}] " + " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()))

            is_best = val_loss is not None and val_loss < best_val
            if is_best:
                best_val = val_loss
                bad = 0
            elif val_loss is not None:
                bad += 1
            if self.ckpt is not None:
                self.ckpt.save(epoch, jax.device_get(state),
                               metadata=metadata, history=self.history,
                               is_best=is_best)
            if plateau is not None and val_loss is not None:
                lr_scale = plateau.step(val_loss)
            if (early_stop_patience is not None and val_loss is not None
                    and bad >= early_stop_patience):
                log(f"early stop at epoch {epoch}")
                break
        return state
