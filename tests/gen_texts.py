"""Parity-test corpus: thin wrapper over the package's deterministic
document-text generators (``ocr_api_spark.sources.doctexts``)."""

from __future__ import annotations

import random

from ocr_api_spark.sources.doctexts import GENERATORS


def corpus(seed: int, n_per_family: int) -> list[tuple[str, str]]:
    """Deterministic [(family, text)] corpus across every generator."""
    out = []
    for family, gen in GENERATORS.items():
        rng = random.Random(f"{seed}:{family}")
        for _ in range(n_per_family):
            text, _truth = gen(rng)
            out.append((family, text))
    return out
