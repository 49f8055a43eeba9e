"""Unit tests for scripts/fingerprints.py — the computed rework
detector that drives the driver-row priority rule (round-7 verdict,
Next round #2). The failure mode it exists to catch: a shared-source
edit reworks a query whose hand-maintained rework list entry is
missing, so its only green driver row silently predates the rework
(q90 in round 6)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from fingerprints import PKG, fingerprint_query  # noqa: E402

Q = f"{PKG}/queries/fake_q.py"
OP = f"{PKG}/operators/fake_op.py"
OP2 = f"{PKG}/operators/fake_other.py"

BASE = {
    Q: b'''
"""module docstring"""
from anime_data_pipeline_spark.operators.fake_op import transform

SHARED = 10

def _helper(x):
    return transform(x) + SHARED

def q_one(spark, sf_dir):
    """q_one docstring"""
    return _helper(1)

def q_two(spark, sf_dir):
    # q_two never touches _helper or fake_op
    from anime_data_pipeline_spark.operators.fake_other import flip
    return flip(2)
''',
    OP: b'''
def transform(x):
    return x * 2
''',
    OP2: b'''
def flip(x):
    return -x
''',
}


def _loader(files):
    return lambda relpath: files.get(relpath)


def _fp(files, fn):
    return fingerprint_query(f"{PKG}.queries.fake_q", fn, _loader(files), {})


def test_docstring_and_comment_edits_are_not_reworks():
    edited = dict(BASE)
    edited[Q] = BASE[Q].replace(b'"""q_one docstring"""', b'"""rewritten docs"""')
    edited[Q] = edited[Q].replace(b"# q_two never", b"# reworded comment never")
    assert _fp(BASE, "q_one") == _fp(edited, "q_one")
    assert _fp(BASE, "q_two") == _fp(edited, "q_two")


def test_helper_edit_flags_dependent_not_sibling():
    edited = dict(BASE)
    edited[Q] = BASE[Q].replace(b"+ SHARED", b"+ SHARED + 1")
    assert _fp(BASE, "q_one") != _fp(edited, "q_one")  # uses _helper
    assert _fp(BASE, "q_two") == _fp(edited, "q_two")  # does not


def test_module_constant_edit_flags_referencing_query():
    edited = dict(BASE)
    edited[Q] = BASE[Q].replace(b"SHARED = 10", b"SHARED = 11")
    assert _fp(BASE, "q_one") != _fp(edited, "q_one")
    assert _fp(BASE, "q_two") == _fp(edited, "q_two")


def test_operator_module_edit_reaches_top_level_import_user():
    edited = dict(BASE)
    edited[OP] = b"def transform(x):\n    return x * 3\n"
    assert _fp(BASE, "q_one") != _fp(edited, "q_one")
    assert _fp(BASE, "q_two") == _fp(edited, "q_two")


def test_function_local_import_is_tracked():
    """q_two's only operator dependency is a FUNCTION-LOCAL import —
    the dominant style inside real query functions (the first slicer
    draft missed these entirely and under-flagged q187)."""
    edited = dict(BASE)
    edited[OP2] = b"def flip(x):\n    return -x - 1\n"
    assert _fp(BASE, "q_two") != _fp(edited, "q_two")
    assert _fp(BASE, "q_one") == _fp(edited, "q_one")


def test_missing_function_falls_back_to_module_fingerprint():
    """A renamed function at an old rev can't be sliced — the fallback
    hashes the whole module, which differs from any slice, so the
    query is flagged (over-selection is the safe direction)."""
    renamed = dict(BASE)
    renamed[Q] = BASE[Q].replace(b"def q_one", b"def q_one_v2")
    assert _fp(BASE, "q_one") != _fp(renamed, "q_one")


def test_transitive_operator_closure_is_included():
    """fake_op growing an import of fake_other pulls fake_other into
    q_one's fingerprint: operator modules hash as their full closure."""
    base2 = dict(BASE)
    base2[OP] = (
        b"from anime_data_pipeline_spark.operators.fake_other import flip\n"
        b"def transform(x):\n    return flip(x) * 2\n"
    )
    edited = dict(base2)
    edited[OP2] = b"def flip(x):\n    return -x - 1\n"
    assert _fp(base2, "q_one") != _fp(edited, "q_one")


def test_snapshot_matches_worktree_when_clean():
    """On a clean tree the live snapshot diff is exactly the declared
    changed-set of the entry file (covered in test_cli), and every
    registered query fingerprints without error."""
    from fingerprints import query_fingerprints, worktree_loader

    fps = query_fingerprints(worktree_loader)
    assert len(fps) >= 189
    assert all(len(v) == 64 for v in fps.values())


def test_conditional_module_level_binding_is_sliced():
    """A name bound inside a module-level try/except (the import
    feature-gate pattern) must still participate in slices — the first
    slicer only scanned direct tree.body statements and silently
    dropped such names (under-selection, the failure direction this
    tool exists to prevent). The whole compound statement is the
    binding node, so editing EITHER branch reworks the dependents."""
    files = dict(BASE)
    files[Q] = BASE[Q] + b'''
try:
    from anime_data_pipeline_spark.operators.fake_op import transform as IMPL
except ImportError:
    IMPL = None

def q_three(spark, sf_dir):
    return IMPL(3)
'''
    edited = dict(files)
    edited[Q] = files[Q].replace(b"IMPL = None", b"IMPL = _helper")
    assert _fp(files, "q_three") != _fp(edited, "q_three")
    # siblings untouched by the compound statement stay stable
    assert _fp(files, "q_two") == _fp(edited, "q_two")
    # and the import INSIDE the try still pulls the operator module
    edited_op = dict(files)
    edited_op[OP] = b"def transform(x):\n    return x * 9\n"
    assert _fp(files, "q_three") != _fp(edited_op, "q_three")
