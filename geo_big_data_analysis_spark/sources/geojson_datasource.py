"""Custom ``geojson`` Python DataSource (Spark 4 DataSource API).

Upgrades the S6 GeoJSON read (visualize_noise.py:29-32) from the
``spark.read.json`` + explode workaround to a first-class format:

    spark.dataSource.register(GeoJSONDataSource)
    df = spark.read.format("geojson").load("/data/features/")

Scale design:
- one InputPartition per ``.geojson``/``.json`` file — a directory of
  city extracts parallelizes across executors with no driver parsing;
  the driver only globs the listing.
- fixed, declared schema (no inference pass over the data):
  ``feature_id, geom_type, lon, lat, properties map<string,string>,
  coordinates_json, src_file``. Point coordinates land typed in
  lon/lat; other geometries keep full fidelity in ``coordinates_json``
  for the geometry layer (grid-cell expansion, clipping).
- malformed features are SKIPPED, not fatal (the S4 permissive-scan
  convention); a whole-file parse failure raises — a missing/corrupt
  file is an ingestion error, not a data row.

The reader yields plain tuples; Spark moves them through Arrow batches.
A Python source costs one serde crossing per row — the right trade for
a parse Spark has no native reader for; columnar formats stay on the
native JVM readers.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

GEOJSON_SCHEMA = (
    "feature_id string, geom_type string, lon double, lat double, "
    "properties map<string,string>, coordinates_json string, src_file string"
)


def _feature_row(feat: dict, src_file: str):
    if not isinstance(feat, dict) or feat.get("type") != "Feature":
        return None
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    coords = geom.get("coordinates")
    if gtype is None or coords is None:
        return None
    lon = lat = None
    if gtype == "Point":
        try:
            lon, lat = float(coords[0]), float(coords[1])
        except (TypeError, ValueError, IndexError):
            return None
    props = feat.get("properties") or {}
    if not isinstance(props, dict):
        return None
    props_str = {
        str(k): (json.dumps(v) if isinstance(v, (dict, list)) else str(v))
        for k, v in props.items()
        if v is not None
    }
    fid = feat.get("id")
    return (
        None if fid is None else str(fid),
        gtype,
        lon,
        lat,
        props_str,
        json.dumps(coords),
        src_file,
    )


class _GeoJSONReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("geojson source requires a path")

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            pats = [
                f"{self.path}/*.geojson",
                f"{self.path}/*.json",
                f"{self.path}/*.geojsonl",
            ]
            out: list[str] = []
            for p in pats:
                out.extend(glob.glob(p))
            # skip metadata files (_MANIFEST.json etc., Hadoop convention)
            return sorted(f for f in out if not os.path.basename(f).startswith("_"))
        return sorted(glob.glob(self.path)) or [self.path]

    def partitions(self):
        return [InputPartition(f) for f in self._files()]

    def read(self, partition):
        src = partition.value
        base = os.path.basename(src)
        if src.endswith(".geojsonl"):
            # newline-delimited Features (GeoJSONSeq) — the at-scale
            # flavor; malformed LINES skip (S4 permissive convention)
            with open(src) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        feat = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    row = _feature_row(feat, base)
                    if row is not None:
                        yield row
            return
        with open(src) as fh:
            doc = json.load(fh)
        if doc.get("type") == "FeatureCollection":
            feats = doc.get("features") or []
        elif doc.get("type") == "Feature":
            feats = [doc]
        else:
            raise ValueError(f"{src}: not a GeoJSON Feature/FeatureCollection")
        for feat in feats:
            row = _feature_row(feat, base)
            if row is not None:
                yield row


class _GeoJSONCommit(WriterCommitMessage):
    def __init__(self, file: str, count: int):
        self.file = file
        self.count = count


class _GeoJSONWriter(DataSourceWriter):
    """S8 sink as a first-class format: each partition writes one
    ``.geojsonl`` file of Feature objects (newline-delimited GeoJSON —
    the flavor that parallelizes on read), columns ``lon``/``lat``
    become the Point geometry, every other column a property. The
    driver-side ``commit`` publishes a ``_MANIFEST.json`` with per-file
    row counts — readers can detect partial/aborted writes."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("geojson sink requires a path")
        self.lon_col = options.get("lon_col", "lon")
        self.lat_col = options.get("lat_col", "lat")

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.geojsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                d = row.asDict()
                lon = d.pop(self.lon_col, None)
                lat = d.pop(self.lat_col, None)
                if lon is None or lat is None:
                    continue
                feat = {
                    "type": "Feature",
                    "geometry": {
                        "type": "Point",
                        "coordinates": [float(lon), float(lat)],
                    },
                    "properties": d,
                }
                fh.write(json.dumps(feat, default=str) + "\n")
                n += 1
        return _GeoJSONCommit(fname, n)

    def commit(self, messages):
        manifest = {
            "files": {m.file: m.count for m in messages},
            "total": sum(m.count for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.file))
            except OSError:
                pass


class GeoJSONDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "geojson"

    def schema(self) -> str:
        return GEOJSON_SCHEMA

    def reader(self, schema):
        return _GeoJSONReader(self.options)

    def writer(self, schema, overwrite):
        return _GeoJSONWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(GeoJSONDataSource)
