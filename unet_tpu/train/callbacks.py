"""Training callbacks: early stopping + Orbax checkpoint management.

Reference counterparts: EarlyStopping (unet/utils/callbacks.py:15-91) and
ModelCheckpoint (callbacks.py:94-238, saving ``last.pt`` each epoch and
``best.pt`` on monitored improvement, payload = epoch + model/optimizer/
scheduler state + metrics + full config, with nested metric keys like
``class_dice.tumor``).

TPU-native redesign: checkpoints are Orbax directories (async-safe,
preemption-friendly — the "failure detection" story from SURVEY.md §5 is
auto-resume from ``last``), the config/metrics/epoch are stored as JSON
next to the tensors so ``predict`` can rebuild the architecture without
knowing the training pytree structure, and the "model" (params +
batch_stats of whichever weights were validated — EMA after warmup) is
saved separately from the full train state.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

from unet_tpu.utils.config import get_nested_metric


class EarlyStopping:
    """Stop when the monitored score stops improving
    (ref callbacks.py:15-91)."""

    def __init__(self, patience: int = 20, mode: str = 'max',
                 min_delta: float = 0.0):
        if mode not in ('min', 'max'):
            raise ValueError(f'mode must be min or max, got {mode}')
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.reset()

    def reset(self) -> None:
        self.best = -math.inf if self.mode == 'max' else math.inf
        self.counter = 0
        self.stopped = False

    def _improved(self, score: float) -> bool:
        if self.mode == 'max':
            return score > self.best + self.min_delta
        return score < self.best - self.min_delta

    def __call__(self, score: float) -> bool:
        if self._improved(score):
            self.best = score
            self.counter = 0
            return False
        self.counter += 1
        if self.counter >= self.patience:
            self.stopped = True
            return True
        return False

    def state_dict(self) -> Dict:
        return {'best': self.best, 'counter': self.counter,
                'stopped': self.stopped}

    def load_state_dict(self, s: Dict) -> None:
        self.best, self.counter = s['best'], s['counter']
        self.stopped = s.get('stopped', False)


def _to_host(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    """Saves ``last`` every epoch and ``best`` on monitored improvement
    (ref callbacks.py:158-214). Layout::

        save_dir/
          last/  state/   (orbax pytree: full TrainState)
                 model/   (orbax pytree: {'params', 'batch_stats'})
                 meta.json (epoch, metrics, config, scheduler, monitor)
          best/  ...same...
    """

    def __init__(self, save_dir, monitor: str = 'class_dice.tumor',
                 mode: str = 'max', save_last: bool = True,
                 save_best: bool = True, use_async: bool = True):
        if not _HAS_ORBAX:
            raise ImportError('orbax-checkpoint is required')
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.save_best = save_best
        self.best_value = -math.inf if mode == 'max' else math.inf
        self.best_epoch = -1
        # Async writes (SURVEY.md §5 failure-detection plan): the train
        # loop hands off *host copies* (_to_host below — the live device
        # buffers are donated into the next step, so they must be
        # snapshotted anyway) and the tensor serialization overlaps the
        # next epoch. wait_until_finished() runs before re-writing the
        # same directory and at close().
        self._async = use_async
        # Multi-host: the train CLI instantiates this manager on
        # process 0 only (the state is replicated; workers never call
        # save). Orbax's default save path runs cross-process sync
        # barriers and would hang / die when the workers exit — scope
        # it to this process explicitly.
        kw = {}
        if jax.process_count() > 1:
            kw['multiprocessing_options'] = ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()})
        # StandardCheckpointer is an AsyncCheckpointer (orbax >= 0.11):
        # save() dispatches serialization to a background thread. Two
        # instances let the (large) state and (small) model writes both
        # overlap the next epoch; with use_async=False every _write
        # drains immediately (tests / strict-durability callers).
        self._ckptr = ocp.StandardCheckpointer(**kw)
        self._ckptr_model = (ocp.StandardCheckpointer(**kw) if use_async
                             else self._ckptr)
        # meta.json is published by a background thread as soon as the
        # tensor saves it describes are durable: a meta that lands before
        # its orbax commit would advertise a checkpoint a preemption can
        # leave unrestorable, while deferring publication to the *next*
        # epoch's save (the old design) left a whole-epoch window where a
        # crash paired epoch-N tensors with an epoch-N-1 meta.json.
        self._publisher = None
        self._publish_error: Optional[BaseException] = None

    def _publish(self, path: Path, meta: Dict) -> None:
        try:
            self._ckptr.wait_until_finished()
            self._ckptr_model.wait_until_finished()
            tmp = path / 'meta.json.tmp'
            tmp.write_text(json.dumps(meta, default=float))
            tmp.rename(path / 'meta.json')  # atomic publish
        except BaseException as e:  # surfaced by the next wait()/close()
            # a meta-less checkpoint is unrestorable by --resume auto;
            # swallowing this would let training report saved
            # checkpoints that a preemption can't recover from
            self._publish_error = e
            raise

    def wait(self) -> None:
        """Block until all in-flight async saves are durable and their
        meta.json files are published. Raises if a background publish
        failed (e.g. disk full after the tensor commit)."""
        if self._publisher is not None:
            self._publisher.join()
            self._publisher = None
        self._ckptr.wait_until_finished()
        self._ckptr_model.wait_until_finished()
        if self._publish_error is not None:
            err, self._publish_error = self._publish_error, None
            raise RuntimeError(
                'checkpoint meta.json publication failed; the checkpoint '
                'is not resumable') from err

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
        if self._async:
            self._ckptr_model.close()

    def _write(self, name: str, state: Any, model_vars: Dict, epoch: int,
               metrics: Dict, config: Optional[Dict],
               scheduler_state: Optional[Dict],
               step: Optional[int] = None) -> None:
        path = (self.save_dir / name).resolve()
        path.mkdir(parents=True, exist_ok=True)
        # serialize against the previous in-flight save before
        # overwriting the same directories
        self.wait()
        # orbax's save is itself atomic (tmp dir + rename); force=True
        # overwrites the previous epoch's checkpoint.
        self._ckptr.save(path / 'state', _to_host(state), force=True)
        self._ckptr_model.save(path / 'model', _to_host(model_vars),
                               force=True)
        meta = {
            'epoch': int(epoch),
            'step': None if step is None else int(step),
            'metrics': metrics,
            'config': config,
            'scheduler': scheduler_state,
            'monitor': self.monitor,
            'monitor_value': get_nested_metric(metrics, self.monitor),
        }
        if self._async:
            import threading
            self._publisher = threading.Thread(
                target=self._publish, args=(path, meta), daemon=True)
            self._publisher.start()
        else:
            self._publish(path, meta)

    def save(self, state: Any, model_vars: Dict, epoch: int, metrics: Dict,
             config: Optional[Dict] = None,
             scheduler_state: Optional[Dict] = None) -> bool:
        """Returns True when this epoch improved the monitored metric."""
        step = getattr(state, 'step', None)
        if self.save_last:
            self._write('last', state, model_vars, epoch, metrics, config,
                        scheduler_state, step=step)
        value = get_nested_metric(metrics, self.monitor)
        improved = (value > self.best_value if self.mode == 'max'
                    else value < self.best_value)
        if improved:
            self.best_value = value
            self.best_epoch = epoch
            if self.save_best:
                self._write('best', state, model_vars, epoch, metrics,
                            config, scheduler_state, step=step)
        return improved

    # ---- restore ----
    @staticmethod
    def find_auto_resume(save_root, experiment_name: str):
        """``--resume auto``: newest run dir (exp, exp2, exp3, ...)
        under ``save_root`` holding a restorable checkpoint, or None
        for a fresh start. Prefers ``weights/last``; falls back to
        ``weights/best`` in the same run when a preemption landed in
        the middle of the (asynchronous, force-overwriting) last-save
        and left it unrestorable. The preemption/failure-recovery story
        (SURVEY.md §5): relaunch with the same config + ``--resume
        auto`` and training continues in the same run directory."""
        root = Path(save_root)

        def suffix_num(p: Path) -> int:
            s = p.name[len(experiment_name):]
            return int(s) if s.isdigit() else 1

        def restorable(run: Path):
            for name in ('last', 'best'):
                c = run / 'weights' / name
                if (c / 'meta.json').exists() and (c / 'state').exists():
                    return c
            return None

        candidates = [
            p for p in root.glob(f'{experiment_name}*')
            if (p.name == experiment_name
                or p.name[len(experiment_name):].isdigit())
            and restorable(p) is not None
        ]
        if not candidates:
            return None
        return restorable(max(candidates, key=suffix_num))

    @staticmethod
    def read_meta(path) -> Dict:
        return json.loads((Path(path) / 'meta.json').read_text())

    @staticmethod
    def _local_ckptr():
        """A checkpointer scoped to this process: restores are
        independent per-process reads (each process loads its own copy
        of the replicated state), so no cross-process barriers."""
        kw = {}
        if jax.process_count() > 1:
            kw['multiprocessing_options'] = \
                ocp.options.MultiprocessingOptions(
                    primary_host=jax.process_index(),
                    active_processes={jax.process_index()})
        return ocp.StandardCheckpointer(**kw)

    @staticmethod
    def restore_model(path, target: Optional[Dict] = None) -> Dict:
        """Restore {'params', 'batch_stats'} for inference. ``target``
        (an abstract/concrete template) is optional."""
        ckptr = CheckpointManager._local_ckptr()
        p = (Path(path) / 'model').resolve()
        if target is None:
            return ckptr.restore(p)
        return ckptr.restore(p, target=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target))

    @staticmethod
    def restore_state(path, target: Any) -> Any:
        """Restore the full TrainState given a template with the right
        pytree structure (from init_train_state)."""
        ckptr = CheckpointManager._local_ckptr()
        p = (Path(path) / 'state').resolve()
        return ckptr.restore(p, target=jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            target))
