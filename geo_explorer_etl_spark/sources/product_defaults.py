"""Per-product chart-default registry (SURVEY.md §2.11 L4; reference
json_handler.py:29–37 + product_defaults.json): JSON config keyed by
product id with a ``"default"`` fallback entry, merged over the
engine-wide CHART_DEFAULTS."""

from __future__ import annotations

import json
from pathlib import Path

from geo_explorer_etl_spark.plans.star_schema import CHART_DEFAULTS


class ProductDefaults:
    def __init__(self, path: str | None = None):
        self._data: dict[str, dict] = {}
        if path and Path(path).exists():
            self._data = json.loads(Path(path).read_text())

    def for_product(self, pid: int) -> dict:
        """CHART_DEFAULTS <- file's "default" entry <- per-pid entry
        (rightmost wins), mirroring the reference's fallback chain."""
        merged = dict(CHART_DEFAULTS)
        merged.update(self._data.get("default", {}))
        merged.update(self._data.get(str(pid), {}))
        return merged
