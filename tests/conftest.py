import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    # 8 CPUs: library actor pools autoscale up to (1, 4); the session
    # must keep headroom for stateless upstream tasks or pools starve
    # them (observed hang at num_cpus=4).
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Deterministic block order for the suite: Ray's default
    # preserve_order=False lets to_pandas() see blocks in completion
    # order, which flips under load (observed: read_bed's 2-line file
    # split into 2 blocks arriving reversed mid-suite). Tests assert
    # file/line order in several places; ordering costs nothing at
    # fixture scale. Production paths keep the streaming default.
    ctx.execution_options.preserve_order = True
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic corpus/entities/gold_triples trio (FIXTURES.md)."""
    from tools.gen_corpus import generate

    out = tmp_path_factory.mktemp("fixtures")
    generate(str(out), n_docs=200, seed=42)
    return str(out)


SF_DIR = "/root/testdata/sf0.001"
