import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    from cckp_toolkit_workflow_ray.logfilter import (
        install_empty_column_size_filter,
        make_worker_setup_hook,
    )

    install_empty_column_size_filter()
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={
            "worker_process_setup_hook": make_worker_setup_hook(),
        },
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages_dir(ray_session, tmp_path_factory):
    """2k-row seeded-violation pages fixture written once per session."""
    from cckp_toolkit_workflow_ray.sources.pages import write_pages

    out = str(tmp_path_factory.mktemp("pages_tiny"))
    write_pages(2000, out, seed=42, violations=True)
    return out


@pytest.fixture(scope="session")
def tiny_pages_table(tiny_pages_dir):
    import pyarrow.dataset as pads

    return pads.dataset(tiny_pages_dir, format="parquet").to_table()
