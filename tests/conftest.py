import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """ONE Ray session for the whole pytest run (driver contract)."""
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_sequences(tmp_path_factory):
    """Deterministic small sequences table: (paths, pa.Table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.datagen import generate_sequences

    d = tmp_path_factory.mktemp("seq") / "in"
    paths = generate_sequences(str(d), rows=4000, num_files=4, seed=42)
    table = pa.concat_tables([pq.read_table(p) for p in paths])
    return paths, table
