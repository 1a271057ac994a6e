"""Deterministic Energy-Charts-shaped fixture payloads (FIXTURES.md §B).

Generates the bronze payload dicts the medallion pipeline ingests in
hermetic tests: 15-min power grids with ~8 production types (including
exact ``"Wind offshore"`` and a ``" Wind Offshore "`` normalization
variant), hourly price arrays with all three field-name variants
(``price`` / ``prices`` / ``data``) to exercise the coalesce probe,
deliberate array misalignment and embedded nulls to exercise
arrays_zip padding + the null-drop filter, and negative prices.
Seeded; same inputs → same payloads.
"""

from __future__ import annotations

import random
from datetime import date, datetime, timezone

POWER_TYPES = (
    "Wind offshore",
    "Wind onshore",
    "Solar",
    "Biomass",
    "Hydro Run-of-River",
    "Fossil gas",
    "Fossil hard coal",
    "Nuclear",
)

# One per-day variant carries a whitespace/case variant of the offshore
# label so the gold filter's lower(trim()) normalization is exercised.
OFFSHORE_VARIANT = " Wind Offshore "

PRICE_FIELD_VARIANTS = ("price", "prices", "data")


def _day_epochs(day: str, step_s: int) -> list[int]:
    d = date.fromisoformat(day)
    start = int(
        datetime(d.year, d.month, d.day, tzinfo=timezone.utc).timestamp()
    )
    return list(range(start, start + 86400, step_s))


def power_payload(day: str, seed: int = 42, misaligned: bool = False) -> dict:
    """One day of 15-min production data (96 slots × len(POWER_TYPES))."""
    # str seeding is process-stable (SHA-512 based); tuple.__hash__ is
    # PYTHONHASHSEED-randomized and would change the corpus per process.
    rng = random.Random(f"{seed}:power:{day}")
    epochs = _day_epochs(day, 900)
    types = []
    for i, name in enumerate(POWER_TYPES):
        if i == 0 and rng.random() < 0.5:
            name = OFFSHORE_VARIANT
        data: list[float | None] = [
            round(rng.uniform(0, 5000), 1) for _ in epochs
        ]
        # sprinkle nulls (≈2%) → dropped by the silver null filter
        for _ in range(2):
            data[rng.randrange(len(data))] = None
        if misaligned and i == 1:
            # shorter value array → arrays_zip pads the tail with null
            # structs → rows dropped by the null filter
            data = data[:-5]
        types.append({"name": name, "data": data})
    return {
        "unix_seconds": [float(e) for e in epochs],
        "production_types": types,
        "deprecated": None,
    }


def price_payload(day: str, seed: int = 42, variant: int | None = None) -> dict:
    """One day of hourly prices under a rotating field-name variant."""
    rng = random.Random(f"{seed}:price:{day}")
    epochs = _day_epochs(day, 3600)
    prices = [round(rng.uniform(-20, 180), 2) for _ in epochs]
    field = PRICE_FIELD_VARIANTS[
        (variant if variant is not None else date.fromisoformat(day).day)
        % len(PRICE_FIELD_VARIANTS)
    ]
    return {
        "unix_seconds": [float(e) for e in epochs],
        field: prices,
        "unit": "EUR / MWh",
    }


def fixture_payloads(
    days: list[str], seed: int = 42
) -> dict[str, dict[str, dict]]:
    """Full payload set for LocalJsonSource: both datasets, all days.

    The second day's power payload is misaligned on purpose.
    """
    return {
        "public_power_de": {
            d: power_payload(d, seed, misaligned=(i == 1))
            for i, d in enumerate(days)
        },
        "price_de_lu": {d: price_payload(d, seed) for d in days},
    }
