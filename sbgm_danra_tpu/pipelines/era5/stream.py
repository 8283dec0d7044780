"""Streaming download -> transfer -> delete with remote resume.

Re-design of era5_download_pipeline/pipeline/stream.py:15-141: for each
(variable, year) the file is downloaded, rsynced to the cluster and deleted
locally to bound disk usage. Resume semantics preserved exactly (:100-123):
years already present remotely are skipped EXCEPT the newest one, which is
re-done because a crash may have left it partial (restartability).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, List, Optional, Sequence, Set

from sbgm_danra_tpu.pipelines.era5.download import DownloadSpec, download_year
from sbgm_danra_tpu.pipelines.era5.transfer import remote_years_present, rsync_push

logger = logging.getLogger(__name__)


def years_to_process(requested: Sequence[int], present: Set[int]) -> List[int]:
    """Skip remotely complete years except the newest present one (:100-123)."""
    if not present:
        return list(requested)
    redo = max(present)
    return [y for y in requested if y not in present or y == redo]


def download_transfer_delete(
    client: Callable,
    spec: DownloadSpec,
    remote: str,
    remote_dir: str,
    runner: Optional[Callable[[Sequence[str]], str]] = None,
    keep_local: bool = False,
) -> Dict[str, List[int]]:
    """Stream every (variable, year): download -> rsync -> local delete."""
    from sbgm_danra_tpu.pipelines.era5.transfer import subprocess_capture

    runner = runner or subprocess_capture
    levels = list(spec.pressure_levels) or [None]
    processed: Dict[str, List[int]] = {}
    for var in spec.variables:
        # per-variable remote layout: the reference's lumi dirs embed {var}
        # (era5_pipeline.yaml lumi: block)
        var_dir = remote_dir.format(var=var) if "{var}" in remote_dir else remote_dir
        present = remote_years_present(remote, var_dir, var, runner)
        todo = years_to_process(spec.years, present)
        logger.info("%s: %d years remote, %d to process", var, len(present), len(todo))
        done = []
        for year in todo:
            for level in levels:
                path = download_year(client, spec, var, year, level)
                rsync_push(path, remote, var_dir, runner)
                if not keep_local and os.path.exists(path):
                    os.remove(path)
            done.append(year)
        processed[var] = done
    return processed
