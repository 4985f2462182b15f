"""Per-product policy: the mixed-geo / justice special cases.

The reference threads `prod_is_mixed_geo_justice` flags through five
operators (reference main.py:20; dfhandler.py:146–150, 437–443, 473,
571–572, 601–615). Here the special-casing is isolated in ONE object
(SURVEY.md §7 hard part #5) so the core operators stay clean: each
pipeline stage asks the policy for its filter/repair column instead of
re-implementing the flag logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# Geographic levels that mixed-geo products keep for pre-2017 years
# (country / province-territory tiers, reference dfhandler.py:439).
MIXED_GEO_KEEP_LEVELS = ("A0000", "A0001", "A0002")


@dataclass(frozen=True)
class ProductPolicy:
    """Behaviour switches for one product's pipeline run."""

    product_id: int
    min_ref_year: int = 2016
    mixed_geo: bool = False          # justice pids, reference main.py:20
    is_sibling: bool = False         # merged-product member, not master
    # pid used in composite IndicatorCodes: the MASTER's for merged
    # siblings (their values must link to the master's indicators —
    # reference helpers.py:39–45, main.py:169–170), own pid otherwise.
    code_product_id: int | None = None

    @property
    def effective_code_pid(self) -> int:
        return self.code_product_id if self.code_product_id is not None else self.product_id

    def value_row_filter(self, ref_year: Column, geo_level: Column) -> Column:
        """P3/P4 — which fact rows survive.

        Normal products: RefYear >= min_ref_year.
        Mixed-geo: keep pre-2017 rows only at the national/provincial
        levels (reference dfhandler.py:437–443, 473–475).
        """
        if not self.mixed_geo:
            return ref_year >= self.min_ref_year
        return (ref_year >= 2017) | geo_level.isin(*MIXED_GEO_KEEP_LEVELS)

    def geo_level_bridge_filter(self, geo_level: Column) -> Column:
        """Sibling products additionally drop the mixed-geo keep-levels
        from their geo-level bridge (reference dfhandler.py:146–150)."""
        if self.mixed_geo and self.is_sibling:
            return ~geo_level.isin(*MIXED_GEO_KEEP_LEVELS)
        return F.lit(True)

    @property
    def repair_dguids(self) -> bool:
        """F5 runs for EVERY justice product — subject code "35", the
        first two digits of the product id (reference dfhandler.py:601
        gates ``fix_dguid`` on ``get_subject_code_from_product_id(...)
        == "35"``, helpers.py:124–126) — not just the mixed-geo trio."""
        return str(self.product_id)[:2] == "35"
