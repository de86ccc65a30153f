from __future__ import annotations

import os
import sys
import tempfile

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

# transformWithStateInPandas (streaming/state_v2.py) needs a runtime
# google.protobuf, which isn't pip-installed here. Some hosts ship a
# pure-Python protobuf inside the (public) Google Cloud SDK's App
# Engine bundle; if the real package is absent but that bundle exists,
# expose JUST its google/protobuf subtree through a shim dir (never the
# whole bundle — it carries appengine/auth/oauth2 packages that could
# shadow real ones) and extend PYTHONPATH so Spark's Python workers
# inherit it. Must run at conftest import time, before the JVM starts.
# On hosts with neither, tests/test_state_v2.py keeps its importorskip.
_PROTOBUF_BUNDLE = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
)


def _ensure_protobuf_fallback() -> None:
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    if not os.path.isdir(_PROTOBUF_BUNDLE):
        return
    shim = os.path.join(tempfile.gettempdir(), "isp_protobuf_shim")
    gdir = os.path.join(shim, "google")
    os.makedirs(gdir, exist_ok=True)
    init = os.path.join(gdir, "__init__.py")
    if not os.path.exists(init):
        with open(init, "w") as f:
            f.write(
                "__path__ = __import__('pkgutil')"
                ".extend_path(__path__, __name__)\n"
            )
    link = os.path.join(gdir, "protobuf")
    if not os.path.lexists(link):
        os.symlink(_PROTOBUF_BUNDLE, link)
    sys.path.insert(0, shim)
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    # the bundle is a '-dev' runtime build; protobuf's version check
    # rejects any gencode whose suffix differs from the runtime's, so
    # pyspark's generated StateMessage_pb2 (a release gencode) would
    # fail on suffix alone. The official escape hatch is this env var —
    # scoped to the fallback branch only (a real pip protobuf never
    # gets here).
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_ensure_protobuf_fallback()

from in_stream_processing_course_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("isp-course-spark-tests", shuffle_partitions="8")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def drip_json_chunks(tmp_path, chunks) -> str:
    """Write each chunk (a list of row dicts) as one JSON-lines file,
    sleeping between files so the file stream source orders
    micro-batches by mtime. Shared by the streaming equivalence tests.
    """
    import json
    import time

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(chunks):
        with open(in_dir / f"c{i}.json", "w") as f:
            for row in chunk:
                f.write(json.dumps(row) + "\n")
        time.sleep(1.1)
    return str(in_dir)
