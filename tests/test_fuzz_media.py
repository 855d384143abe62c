"""Binary-blob decoder fuzz, wired into pytest.

Thin wrapper over scripts/fuzz_media.py (see its docstring): mutated
media payloads must decode-or-raise DecoderNotAvailable — never leak
IndexError/struct.error/ValueError, never hang, never honor implausible
header dimensions.  The fast tripwire runs a small deterministic slice
per format on every commit; the full sweep carries the ``soak`` mark
like the corpus fuzz wall.
"""

from __future__ import annotations

import importlib.util
import sys

import pytest

spec = importlib.util.spec_from_file_location(
    "fuzz_media", "/root/repo/scripts/fuzz_media.py"
)
fuzz = importlib.util.module_from_spec(spec)
sys.modules["fuzz_media"] = fuzz
spec.loader.exec_module(fuzz)

_SEEDS = fuzz._seed_payloads()


@pytest.mark.parametrize("fmt", sorted(_SEEDS))
def test_fuzz_media_tripwire(fmt):
    failures = fuzz.fuzz_format(fmt, _SEEDS[fmt], n=12)
    assert not failures, failures


@pytest.mark.soak
@pytest.mark.parametrize("fmt", sorted(_SEEDS))
def test_fuzz_media_full_sweep(fmt):
    failures = fuzz.fuzz_format(fmt, _SEEDS[fmt], n=150)
    assert not failures, failures
