"""Round-2 late additions, registered behind the driver's 50-row window.

The driver hash-verifies the first 50 registry entries per round
(registry.py docstring); this round those slots are committed to the
previously-unverified surface.  These queries are implemented and
locally oracle-verified now (tests/test_oracle_parity.py), and rotate
into the driver window next round.
"""

from __future__ import annotations

from .behavior_analytics import ORACLE_VALUE_OUTLIERS, q_value_outliers
from .tpch_deep import ORACLE_SHIP_LATENCY_PERCENTILES, q_ship_latency_percentiles

QUERIES = {
    "value_outliers": q_value_outliers,
    "ship_latency_percentiles": q_ship_latency_percentiles,
}

ORACLES = {
    "value_outliers": ORACLE_VALUE_OUTLIERS,
    "ship_latency_percentiles": ORACLE_SHIP_LATENCY_PERCENTILES,
}
