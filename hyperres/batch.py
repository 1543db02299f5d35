"""Batch pair driver: checkpoint/resume + record-and-continue.

The library form of the reference's manifest loop
(legacy_notebooks/comb_exps.ipynb cells 9-11) with the auxiliary
subsystems SURVEY.md section 5 calls for:
- checkpoint/resume: every stage is skipped when its outputs exist (the
  reference's file-existence idempotency), and the batch manifest is
  re-loadable so a crashed run resumes where it stopped;
- failure detection: per-pair try/except with a structured
  attempts/reason ledger (the arosics_coreg.py:123-184 idiom), optional
  bounded retries;
- observability: pairs_manifest.json with per-pair status, stage
  timings, and error records.
"""

from __future__ import annotations

import json
import time
import traceback
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

from .core.config import (
    OrthoConfig, PolyFusionConfig, RidgeSRConfig, TilingConfig,
)
from .pipeline import run_pair_pipeline


@dataclass
class PairJob:
    pair_id: str
    emit_nc_path: str
    s2_stack_tif: str
    meta: Dict = field(default_factory=dict)


class BatchPairDriver:
    """Run the pair pipeline over many jobs with resume + retry."""

    def __init__(self, out_root: Union[str, Path], *,
                 max_retries: int = 1,
                 ortho_config: OrthoConfig = OrthoConfig(),
                 fusion_config: PolyFusionConfig = PolyFusionConfig(),
                 tiling_config: TilingConfig = TilingConfig(),
                 sr_config: Optional[RidgeSRConfig] = RidgeSRConfig(),
                 runner: Optional[Callable] = None):
        self.out_root = Path(out_root)
        self.out_root.mkdir(parents=True, exist_ok=True)
        self.manifest_path = self.out_root / "pairs_manifest.json"
        self.max_retries = max_retries
        self.ortho_config = ortho_config
        self.fusion_config = fusion_config
        self.tiling_config = tiling_config
        self.sr_config = sr_config
        self.runner = runner or self._default_runner
        self.manifest: Dict[str, Dict] = self._load_manifest()

    def _load_manifest(self) -> Dict[str, Dict]:
        if self.manifest_path.exists():
            return json.loads(self.manifest_path.read_text())
        return {}

    def _save_manifest(self) -> None:
        self.manifest_path.write_text(
            json.dumps(self.manifest, indent=2, default=str))

    def _default_runner(self, job: PairJob, pair_dir: Path) -> Dict:
        res = run_pair_pipeline(
            job.emit_nc_path, job.s2_stack_tif, pair_dir,
            ortho_config=self.ortho_config,
            fusion_config=self.fusion_config,
            tiling_config=self.tiling_config,
            sr_config=self.sr_config)
        return {
            "fused_tif": str(res.fused_tif),
            "report": str(res.report_path),
            "n_tiles": len(res.tiles),
            "sr_r2_mean": (res.sr_metrics or {}).get("r2_mean"),
            "total_seconds": res.info.get("total_seconds"),
        }

    def _run_one(self, job: PairJob, device=None) -> Dict:
        """Execute one job (with retries) and return its manifest
        record. ``device``: a jax.Device this pair's computation is
        pinned to (scene-level data parallelism — the job's uploads and
        uncommitted computations land on that chip)."""
        rec = self.manifest.get(job.pair_id, {
            "pair_id": job.pair_id,
            "emit_nc_path": job.emit_nc_path,
            "s2_stack_tif": job.s2_stack_tif,
            "meta": job.meta,
            "status": "pending",
            "attempts": [],
        })
        pair_dir = self.out_root / job.pair_id
        done = False
        for attempt in range(1, self.max_retries + 2):
            t0 = time.perf_counter()
            try:
                if device is not None:
                    import jax

                    with jax.default_device(device):
                        outputs = self.runner(job, pair_dir)
                else:
                    outputs = self.runner(job, pair_dir)
                rec["attempts"].append({
                    "attempt": attempt,
                    "success": True,
                    "seconds": round(time.perf_counter() - t0, 3),
                    **({"device": str(device)} if device is not None
                       else {}),
                })
                rec["status"] = "done"
                rec["outputs"] = outputs
                done = True
                break
            except Exception as e:  # record-and-continue
                rec["attempts"].append({
                    "attempt": attempt,
                    "success": False,
                    "seconds": round(time.perf_counter() - t0, 3),
                    "error": str(e),
                    "traceback": traceback.format_exc(limit=5),
                    **({"device": str(device)} if device is not None
                       else {}),
                })
        if not done:
            rec["status"] = "failed"
        return rec

    def run(self, jobs: List[PairJob], resume: bool = True,
            devices: Optional[list] = None) -> Dict[str, Dict]:
        """Process all jobs; completed pairs are skipped on resume.
        Returns the manifest {pair_id: record}.

        ``devices``: a list of ``jax.Device`` to data-parallelise the
        batch over SCENES — the embarrassingly-parallel axis the
        reference walks sequentially (comb_exps.ipynb cell 9; SURVEY.md
        section 2.8 "data parallelism over tiles/scenes"). One worker
        thread per device pulls jobs from a shared queue and pins each
        pair's device work to its chip via ``jax.default_device``
        (thread-local in JAX), so N granule pipelines run concurrently
        with per-pair ledgers and resume semantics unchanged. Pass
        ``jax.devices()`` for whole-host batches; ``None`` keeps the
        sequential single-device loop."""
        if devices is None or len(devices) <= 1:
            dev = devices[0] if devices else None
            for job in jobs:
                rec = self.manifest.get(job.pair_id, {})
                if resume and rec.get("status") == "done":
                    continue
                self.manifest[job.pair_id] = self._run_one(job, dev)
                self._save_manifest()
            return self.manifest

        import queue
        import threading

        q: "queue.Queue[PairJob]" = queue.Queue()
        for job in jobs:
            if resume and self.manifest.get(job.pair_id,
                                            {}).get("status") == "done":
                continue
            q.put(job)
        lock = threading.Lock()

        def worker(dev):
            while True:
                try:
                    job = q.get_nowait()
                except queue.Empty:
                    return
                rec = self._run_one(job, dev)
                with lock:
                    self.manifest[job.pair_id] = rec
                    self._save_manifest()

        threads = [threading.Thread(target=worker, args=(d,),
                                    daemon=True) for d in devices]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return self.manifest

    def summary(self) -> Dict[str, int]:
        out = {"done": 0, "failed": 0, "pending": 0}
        for rec in self.manifest.values():
            out[rec.get("status", "pending")] = out.get(
                rec.get("status", "pending"), 0) + 1
        return out
