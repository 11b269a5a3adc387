"""Metrics / observability: TensorBoard + optional wandb + profiling hooks.

Counterpart of the reference's logging stack (``jax_ppo.py:444-463`` TB/wandb
setup, ``:1385-1511`` scalar logging, ``scripts/run:472-477`` perfetto
profiling).  All host-side; the trainer produces one already-device_get'd
metrics dict per iteration, so logging adds no extra device syncs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

__all__ = ["MetricsLogger", "profile_trace"]


class MetricsLogger:
    """TensorBoard scalars under ``log_dir/run_name``; mirrors to wandb when
    ``track=True`` and wandb is importable (gated — not in every image)."""

    def __init__(
        self,
        log_dir: str = "runs",
        run_name: Optional[str] = None,
        track: bool = False,
        config: Optional[dict] = None,
        wandb_project: str = "gymca-tpu",
        wandb_entity: Optional[str] = None,
    ):
        self.run_name = run_name or f"run_{int(time.time())}"
        self._writer = None
        self._wandb = None

        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(f"{log_dir}/{self.run_name}")
            if config:
                hp = "|param|value|\n|-|-|\n" + "\n".join(
                    f"|{k}|{v}|" for k, v in sorted(config.items())
                )
                self._writer.add_text("hyperparameters", hp)
        except Exception:  # tensorboard unavailable: stdout-only
            self._writer = None

        if track:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=wandb_project,
                    entity=wandb_entity,
                    name=self.run_name,
                    config=config,
                    sync_tensorboard=self._writer is not None,
                )
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict) -> None:
        if self._writer is not None:
            for k, v in metrics.items():
                try:
                    self._writer.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        if self._wandb is not None and self._writer is None:
            self._wandb.log(metrics, step=step)

    def log_video(self, tag: str, frames, step: int, fps: int = 4) -> None:
        """frames: (T, H, W, 3) uint8.  TensorBoard video when moviepy is
        available, else an animated GIF next to the run's event files."""
        import numpy as np

        frames = np.asarray(frames)
        if self._writer is not None:
            try:
                import moviepy  # noqa: F401 — add_video degrades silently without it
                import torch

                vid = torch.from_numpy(frames[None].transpose(0, 1, 4, 2, 3))
                self._writer.add_video(tag, vid, step, fps=fps)
                return
            except ImportError:  # moviepy missing: GIF fallback below
                pass
            from pathlib import Path

            from PIL import Image

            out = Path(self._writer.log_dir) / f"{tag}_{step}.gif"
            imgs = [Image.fromarray(f) for f in frames]
            imgs[0].save(out, save_all=True, append_images=imgs[1:],
                         duration=int(1000 / fps), loop=0)
        elif self._wandb is not None:
            self._wandb.log(
                {tag: self._wandb.Video(frames.transpose(0, 3, 1, 2), fps=fps)},
                step=step,
            )

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profile_trace(enabled: bool, logdir: str = "./profile"):
    """jax.profiler perfetto trace of the enclosed block (reference
    ``scripts/run:472-477``).  No-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        yield
