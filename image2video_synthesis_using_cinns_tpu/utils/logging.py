"""In-memory metric accumulator + CSV epoch logger.

Parity with reference ``utils/auxiliaries.py:116-156`` (same method names so
training loops read identically). wandb is optional: if it is importable and
``Logging.mode != 'disabled'`` the trainers log there too, else silently skip
(the reference supports ``mode: offline`` similarly, README:187).
"""

from __future__ import annotations

import csv

import numpy as np


class CSVlogger:
    def __init__(self, logname: str, header_names: list[str], enabled: bool = True):
        # ``enabled=False`` makes the logger a no-op (no header, no rows):
        # multi-host trainers construct CSV loggers on every process but only
        # process 0 may touch the filesystem (parallel/distributed.py).
        self.header_names = header_names
        self.logname = logname
        self.enabled = enabled
        if not enabled:
            return
        with open(logname, "a") as csv_file:
            writer = csv.writer(csv_file, delimiter=",")
            writer.writerow(header_names)

    def write(self, inputs: list) -> None:
        if not self.enabled:
            return
        with open(self.logname, "a") as csv_file:
            writer = csv.writer(csv_file, delimiter=",")
            writer.writerow(inputs)


class Logging:
    def __init__(self, keys: list[str]):
        self.keys = keys
        self.dic = {x: [] for x in self.keys}

    def reset(self) -> None:
        self.dic = {x: [] for x in self.keys}

    def append(self, loss_dic: dict) -> None:
        for key in self.dic:
            self.dic[key].append(float(loss_dic[key]))

    def get_iteration_mean(self, horizon: int = 50) -> list[float]:
        out = []
        for val in self.dic.values():
            window = val if len(val) < horizon else val[-horizon:]
            out.append(float(np.mean(window)) if window else float("nan"))
        return out

    def log(self) -> list[float]:
        return [float(np.mean(v)) if v else float("nan") for v in self.dic.values()]


class WandbSink:
    """Lazily-initialised optional wandb logger."""

    def __init__(self):
        self._run = None
        self.enabled = False

    def init(self, log_cfg, config, save_path: str, name: str) -> None:
        mode = (log_cfg or {}).get("mode", "disabled")
        if mode in (None, "disabled", "off"):
            return
        try:
            import wandb

            # reference reads 'entitiy' (sic) which resolves to None under
            # OmegaConf; behaviourally the entity is optional.
            self._run = wandb.init(
                entity=(log_cfg or {}).get("entity"),
                project=(log_cfg or {}).get("project"),
                dir=save_path,
                name=name,
                mode=mode,
                config=config.to_dict() if hasattr(config, "to_dict") else dict(config or {}),
            )
            self.enabled = True
        except Exception:
            self._run = None
            self.enabled = False

    def log(self, dic: dict) -> None:
        if self.enabled and self._run is not None:
            try:
                self._run.log(dic)
            except Exception:
                pass

    def log_video(self, key: str, frames, fps: int = 3) -> None:
        """frames: (T, C, H, W) uint8 — matches plot_vid's return (the
        reference logs the same array via wandb.Video, stage1 main.py:49)."""
        if self.enabled and self._run is not None:
            try:
                import wandb

                self._run.log({key: wandb.Video(frames, fps=fps, format="gif")})
            except Exception:
                pass

    def log_image(self, key: str, image, caption: str | None = None) -> None:
        """image: (H, W, C) uint8 — the reference pushes recon grids via
        wandb.Image (stage2_cINN/AE/main.py:40-43)."""
        if self.enabled and self._run is not None:
            try:
                import wandb

                self._run.log({key: [wandb.Image(image, caption=caption)]})
            except Exception:
                pass
