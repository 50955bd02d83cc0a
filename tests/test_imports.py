"""Every module must at least import cleanly — including the ones whose
runtime needs services absent from this environment (Kafka)."""

from __future__ import annotations

import importlib
import pkgutil

import cdc_init_spark


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        cdc_init_spark.__path__, prefix="cdc_init_spark."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures
