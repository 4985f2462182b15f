"""Merged-product registry (SURVEY.md §2.11 L5): master ↔ sibling
membership for products published as multiple cubes. Driver-side JSON
state, mirroring reference json_handler.py:11–95 — control flow, not
data flow."""

from __future__ import annotations

import json
from pathlib import Path


class MergeRegistry:
    def __init__(self, path: str):
        self.path = Path(path)
        self._data: dict[str, list[int]] = {}
        if self.path.exists():
            self._data = {str(k): list(v) for k, v in json.loads(self.path.read_text()).items()}

    def register(self, master: int, siblings: list[int]) -> None:
        """Register a merged product (reference json_handler.py:87–95)."""
        self._data[str(master)] = sorted(set(siblings))
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self._data, indent=2))

    def is_master(self, pid: int) -> bool:
        return str(pid) in self._data

    def is_sibling(self, pid: int) -> bool:
        return any(pid in sibs for sibs in self._data.values())

    def master_of(self, pid: int) -> int | None:
        for master, sibs in self._data.items():
            if pid in sibs:
                return int(master)
        return None

    def siblings_of(self, master: int) -> list[int]:
        return self._data.get(str(master), [])

    def is_merged_member(self, pid: int) -> bool:
        return self.is_master(pid) or self.is_sibling(pid)

    def ordered(self, pids: list[int]) -> list[int]:
        """Masters before their siblings (reference main.py:128–130,
        helpers.py:39–45): a sibling reuses the master's indicators, so
        the master must be processed first."""
        return sorted(pids, key=lambda p: (self.is_sibling(p), p))
