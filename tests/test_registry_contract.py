"""Registry-level contract checks: every declared oracle must be valid
DuckDB SQL against the real views (EXPLAIN — no execution), names must
be unique and well-formed, and the driver-facing dicts must agree."""

from __future__ import annotations

import re

import pytest

from sklearn_raster_spark.plans.registry import _WINDOW_ORDER, load_all_queries


def test_all_oracles_explain_in_duckdb(sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_utils import duckdb_conn

    con = duckdb_conn(sf_dir)
    qs = load_all_queries()
    broken = {}
    for name, spec in qs.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as ex:  # noqa: BLE001
            broken[name] = str(ex)[:120]
    assert not broken, broken


def test_registry_names_and_window():
    qs = load_all_queries()
    assert all(re.fullmatch(r"q\d+_[a-z0-9_]+", n) for n in qs)
    # window order lists every registered query exactly once
    listed = [n for n in _WINDOW_ORDER if n in qs]
    assert len(listed) == len(set(listed))
    assert set(listed) == set(qs)


def test_driver_contract_views():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    reg = load_all_queries()
    assert set(qs) == set(reg)
    assert set(oracles) == {n for n, s in reg.items() if s.oracle is not None}
    assert all(callable(f) for f in qs.values())


def test_every_query_has_doc():
    qs = load_all_queries()
    undocumented = [n for n, s in qs.items() if len((s.doc or "").strip()) < 30]
    assert not undocumented, undocumented


# The registry-wide scalar-output-schema contract (no array/map/struct
# column in any registered query's output — the driver's canonicalizer
# dies on unhashable cells) is asserted inside
# tests/test_plan_sweep.py::test_no_cartesian_products_or_nested_outputs_anywhere,
# sharing that test's single (expensive) all-builders pass.


# ---------------------------------------------------------------------------
# Media error-mode rule (VERDICT r10 next #7): "strict for
# engine-written assets, quarantine for foreign bytes" — machine-
# checked. Every query whose body scans bytes via binaryFile must
# DECLARE its mode (media_error_mode on the registry entry) and
# justify it in the doc; a declaration on a non-media query is noise
# and fails too.
# ---------------------------------------------------------------------------

import inspect


def _undec_body(fn) -> str:
    """Source of the function body only — the decorator call (whose
    doc string may legitimately mention binaryFile) is cut off."""
    src = inspect.getsource(fn)
    return src[src.index("\ndef "):] if "\ndef " in src else src


def test_binaryfile_queries_declare_error_mode():
    reg = load_all_queries()
    undeclared, spurious, unjustified = [], [], []
    for name, spec in reg.items():
        scans_media = "binaryFile" in _undec_body(spec.fn)
        if scans_media and spec.media_error_mode is None:
            undeclared.append(name)
        if not scans_media and spec.media_error_mode is not None:
            spurious.append(name)
        if scans_media and spec.media_error_mode is not None:
            # the doc must say which posture and carry the rationale
            # vocabulary (strict/raise for engine-written assets,
            # quarantine/NULL-and-survive for foreign bytes)
            doc = spec.doc.lower()
            wants = (
                ("quarantine",)
                if spec.media_error_mode == "quarantine"
                else ("strict", "raise", "engine-written")
            )
            if not any(w in doc for w in wants):
                unjustified.append(name)
    assert not undeclared, (
        f"binaryFile-scanning queries without a declared "
        f"media_error_mode: {undeclared}"
    )
    assert not spurious, (
        f"media_error_mode declared on queries that never scan media "
        f"bytes: {spurious}"
    )
    assert not unjustified, (
        f"declared mode not justified in the query doc: {unjustified}"
    )


def test_known_media_surface():
    """The declared media surface is exactly the known 8 — a new
    binaryFile query extends this list consciously, with its mode."""
    reg = load_all_queries()
    declared = {n: s.media_error_mode for n, s in reg.items() if s.media_error_mode}
    assert declared == {
        "q152_binaryfile_source": "strict",
        "q161_image_decode_features": "strict",
        "q162_audio_decode_features": "strict",
        "q163_jpeg_decode_fidelity": "strict",
        "q164_gif_decode_features": "strict",
        "q165_video_decode_fidelity": "strict",
        "q166_media_quarantine": "quarantine",
        "q167_stream_media_quarantine": "quarantine",
    }
