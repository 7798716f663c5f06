"""Metadata plane: validation rules and lookup predicates
(internal/mprovider/metaprovider.go:18-47, lookup.go:209-292)."""

from __future__ import annotations

import pytest

from btrdb_spark import metadata as md


@pytest.fixture(scope="module")
def streams(spark):
    rows = [
        ("u1", "campus/b1", {"unit": "kw", "phase": "a"}, {"owner": "ops"}, 1, None),
        ("u2", "campus/b1", {"unit": "v"}, {}, 1, None),
        ("u3", "campus/b2", {"unit": "kw"}, {"calib": "x"}, 1, None),
        ("u4", "plant/p1", {"unit": "kw"}, {}, 1, None),
        ("u5", "campus/b3", {"unit": "kw"}, {}, 1, "2024-01-01"),  # tombstoned
    ]
    return spark.createDataFrame(
        rows,
        "uuid string, collection string, tags map<string,string>, "
        "annotations map<string,string>, annotation_version long, tombstoned string",
    )


def test_list_collections_prefix_and_pagination(streams):
    got = [r["collection"] for r in md.list_collections(streams, prefix="campus/").collect()]
    assert got == ["campus/b1", "campus/b2"]  # tombstoned b3 excluded
    got = [r["collection"] for r in md.list_collections(streams, prefix="campus/", starting_from="campus/b2").collect()]
    assert got == ["campus/b2"]


def test_lookup_tag_equality_and_exists(streams):
    got = [r["uuid"] for r in md.lookup_streams(streams, tags={"unit": "kw"}).collect()]
    assert got == ["u1", "u3", "u4"]
    got = [r["uuid"] for r in md.lookup_streams(streams, tags={"phase": None}).collect()]
    assert got == ["u1"]
    got = [r["uuid"] for r in md.lookup_streams(streams, collection="campus/", is_prefix=True, annotations={"calib": None}).collect()]
    assert got == ["u3"]


def test_key_usage_counts(streams):
    got = {(r["kind"], r["key"]): r["cnt"] for r in md.key_usage(streams, prefix="campus/").collect()}
    assert got == {("tag", "unit"): 3, ("tag", "phase"): 1, ("annotation", "owner"): 1, ("annotation", "calib"): 1}


def test_validation_rules():
    md.validate_collection("a/b")
    with pytest.raises(ValueError):
        md.validate_collection("x" * 300)
    md.validate_kv({"ok_key1": "v"}, 32, "tag")
    with pytest.raises(ValueError):
        md.validate_kv({"Bad": "v"}, 32, "tag")
    with pytest.raises(ValueError):
        md.validate_kv({"k": "v" * 300}, 32, "tag")
    with pytest.raises(ValueError):
        md.validate_kv({f"k{i}": "v" for i in range(40)}, 32, "tag")
