import os

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def documents_table(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="session")
def pages_table(documents_table):
    from simple_content_ocr_ray.sources.synth_pages import pages_table_from_documents

    return pages_table_from_documents(documents_table)


@pytest.fixture(scope="session")
def pages_dir(sf_dir, tmp_path_factory):
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    root = tmp_path_factory.mktemp("pages")
    return synth_pages_parquet(sf_dir, out_root=str(root), num_files=4)
