"""Drift guard for the central slow-test tier (conftest.SLOW_TESTS).

The tier marks by exact test name at collection time; a renamed test
would otherwise silently fall out of the tier (and back into the
inner loop) with no signal. This pins every listed name to an
existing `def` in tests/."""

from __future__ import annotations

import os
import re

from tests.conftest import SLOW_TESTS

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_every_slow_name_matches_an_existing_test_def():
    defined: set[str] = set()
    for fname in os.listdir(_TESTS_DIR):
        if not (fname.startswith("test_") and fname.endswith(".py")):
            continue
        with open(os.path.join(_TESTS_DIR, fname), encoding="utf-8") as f:
            defined.update(
                re.findall(r"^def (test_\w+)", f.read(), flags=re.MULTILINE)
            )
    missing = sorted(SLOW_TESTS - defined)
    assert not missing, (
        f"SLOW_TESTS names without a matching test def: {missing} — "
        "renamed tests must be renamed in conftest.SLOW_TESTS too"
    )
