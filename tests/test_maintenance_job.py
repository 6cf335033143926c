"""The spark-submit maintenance entry point: one invocation drains both
changeset feeds into their versioned stores (availableNow), each store
then serving exactly the implied corpus — and the job module ships in
the --py-files zip."""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.jobs.maintenance_job import main
from osm_legal_default_speeds_spark.operators.spatial import (
    encode_vector_tiles,
)
from osm_legal_default_speeds_spark.streaming.inference_maintenance import (
    ROAD_CHANGESET_SCHEMA,
    read_current_results,
)
from osm_legal_default_speeds_spark.streaming.tile_maintenance import (
    CHANGESET_SCHEMA,
    read_current_tiles,
)

SEG_SCHEMA = "seg_id long, lon0 double, lat0 double, lon1 double, lat1 double"


def _stage(spark, tmp_path, name, rows_per_version, schema):
    src = str(tmp_path / name)
    os.makedirs(src, exist_ok=True)
    for v, rows in enumerate(rows_per_version, start=1):
        d = str(tmp_path / f"{name}_build_{v}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        [part] = glob.glob(f"{d}/part-*.parquet")
        dst = f"{src}/f{v:03d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + v, 1_700_000_000 + v))
    return src


def test_maintenance_job_drains_both_feeds(spark, tmp_path, capsys):
    segs_v1 = [(i, -10.0 + i, -5.0 + i, -8.0 + i, -4.0 + i) for i in range(6)]
    segs_v2_new = (0, 30.0, 20.0, 32.0, 21.0)
    seg_cs = [
        [s + ("upsert",) for s in segs_v1],
        [segs_v1[0] + ("remove",), segs_v2_new + ("upsert",)],
    ]
    seg_src = _stage(spark, tmp_path, "segs", seg_cs, CHANGESET_SCHEMA + "")

    road_cs = [
        [
            (1, "ZA", {"highway": "motorway"}, "upsert"),
            (2, "DE", {"highway": "residential", "lit": "yes"}, "upsert"),
        ],
        [
            (2, None, None, "remove"),
            (3, "ZA", {"highway": "residential", "lit": "yes"}, "upsert"),
        ],
    ]
    road_src = _stage(
        spark, tmp_path, "roads", road_cs, ROAD_CHANGESET_SCHEMA
    )

    tile_store = str(tmp_path / "tiles")
    res_store = str(tmp_path / "results")
    main(
        [
            "--seg-changesets", seg_src, "--tile-store", tile_store,
            "--road-changesets", road_src, "--results-store", res_store,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tile-res", "4", "--compact-every", "2",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {
        "job": "maintenance", "tile_version": 1, "results_version": 1,
    }

    # tile store == full re-encode of the implied segment corpus
    implied = [segs_v2_new] + segs_v1[1:]
    want = {
        r["tile_id"]: (r["n_features"], bytes(r["tile_blob"]))
        for r in encode_vector_tiles(
            spark.createDataFrame(implied, SEG_SCHEMA), 4, clip=True
        ).collect()
    }
    got = {
        r["tile_id"]: (r["n_features"], bytes(r["tile_blob"]))
        for r in read_current_tiles(spark, tile_store).collect()
    }
    assert got == want

    # result store == roads 1 and 3 (road 2 removed), full projection
    res = {
        r["road_id"]: (r["road_type_name"], r["certitude"])
        for r in read_current_results(spark, res_store).collect()
    }
    assert set(res) == {1, 3}
    assert res[1][1] in ("Exact", "Fallback")  # ZA motorway row inferred

    # idempotent re-submit: nothing new to drain, versions unchanged
    main(
        [
            "--seg-changesets", seg_src, "--tile-store", tile_store,
            "--road-changesets", road_src, "--results-store", res_store,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tile-res", "4", "--compact-every", "2",
        ]
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == out


def test_maintenance_job_arg_pairs_enforced(tmp_path):
    with pytest.raises(SystemExit):
        main(["--seg-changesets", "/x", "--checkpoint", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(["--checkpoint", str(tmp_path)])


def test_job_module_ships_in_pyfiles_zip(tmp_path):
    import zipfile

    from osm_legal_default_speeds_spark.jobs.pipeline_job import (
        build_pyfiles_zip,
    )

    dest = str(tmp_path / "pkg.zip")
    build_pyfiles_zip(dest)
    with zipfile.ZipFile(dest) as zf:
        names = zf.namelist()
    assert "osm_legal_default_speeds_spark/jobs/maintenance_job.py" in names
    assert (
        "osm_legal_default_speeds_spark/streaming/delta_store.py" in names
    )
