"""Model registry (SURVEY.md §2.9 M15): versioned artifacts with
metadata JSON, a "best"/"latest" pointer, and keep-last-N GC —
the reference's ModelManager (``src/training_service.py:20-117``)
over MLlib-native save/load instead of pickles.

A thin driver-side layer: the artifacts themselves are written by
Spark (``model.write().save()``) so they scale (factor DataFrames are
distributed parquet), while the registry only touches tiny metadata
files.
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass
from pathlib import Path


@dataclass
class ModelVersion:
    name: str
    version: str
    path: str
    metadata: dict


class ModelRegistry:
    def __init__(self, base_dir: str, keep_last: int = 5):
        self.base = Path(base_dir)
        self.keep_last = keep_last
        self.base.mkdir(parents=True, exist_ok=True)

    def _model_dir(self, name: str) -> Path:
        d = self.base / name
        d.mkdir(parents=True, exist_ok=True)
        return d

    def save(
        self,
        name: str,
        model,
        metadata: dict | None = None,
        *,
        promote: bool = True,
    ) -> ModelVersion:
        """Save a fitted MLlib model/pipeline as a new version,
        update the ``latest`` pointer, GC old versions.

        ``promote=False`` QUARANTINES the version: the artifact and
        metadata are written (audit trail for the failed retrain) but
        no pointer moves, so ``load()`` via ``latest``/``best`` can
        never serve it — this is how a quality-gate failure refuses to
        register a degraded model while keeping the evidence."""
        # full-ns suffix keeps versions lexicographically == creation
        # order even within one second (GC relies on this)
        version = time.strftime("%Y%m%d_%H%M%S") + f"_{time.time_ns()}"
        d = self._model_dir(name)
        path = d / version
        model.write().overwrite().save(str(path / "model"))
        meta = {
            "name": name,
            "version": version,
            "created_unix": time.time(),
            "model_class": type(model).__name__,
            "promoted": bool(promote),
            **(metadata or {}),
        }
        (path / "metadata.json").write_text(json.dumps(meta, indent=2))
        if promote:
            (d / "latest.json").write_text(json.dumps({"version": version}))
        self._gc(name)
        return ModelVersion(name, version, str(path), meta)

    def mark_best(self, name: str, version: str) -> None:
        (self._model_dir(name) / "best.json").write_text(
            json.dumps({"version": version})
        )

    def versions(self, name: str) -> list[str]:
        d = self._model_dir(name)
        return sorted(p.name for p in d.iterdir() if p.is_dir())

    def _pointer(self, name: str, pointer: str) -> str:
        f = self._model_dir(name) / f"{pointer}.json"
        if not f.exists():
            raise FileNotFoundError(f"no '{pointer}' pointer for model {name}")
        return json.loads(f.read_text())["version"]

    def load(self, name: str, loader_cls, version: str | None = None, pointer: str = "latest"):
        """Load with the matching MLlib class (e.g. ``ALSModel``)."""
        version = version or self._pointer(name, pointer)
        path = self.base / name / version / "model"
        return loader_cls.load(str(path))

    def metadata(self, name: str, version: str | None = None) -> dict:
        version = version or self._pointer(name, "latest")
        return json.loads(
            (self.base / name / version / "metadata.json").read_text()
        )

    def _gc(self, name: str) -> None:
        """Keep-last-N GC (``src/training_service.py:276-303``),
        never deleting a version a pointer still references."""
        keep = set()
        for ptr in ("latest", "best"):
            try:
                keep.add(self._pointer(name, ptr))
            except FileNotFoundError:
                pass
        versions = self.versions(name)
        excess = [v for v in versions[: -self.keep_last] if v not in keep]
        for v in excess:
            shutil.rmtree(self.base / name / v, ignore_errors=True)
