import pytest

from lira_tpu.config import Config, parse_config
from lira_tpu.logging_utils import ascii_table


def test_required_fields():
    with pytest.raises(ValueError, match="--dataset"):
        Config().update()
    with pytest.raises(ValueError, match="--k"):
        Config(dataset="sift").update()
    with pytest.raises(ValueError, match="--n_bkt"):
        Config(dataset="sift", k=10).update()


@pytest.mark.parametrize(
    "alias,canonical",
    [
        ("l2", "L2"),
        ("euclidean", "L2"),
        ("L2", "L2"),
        ("ip", "inner_product"),
        ("dot", "inner_product"),
        ("inner_product", "inner_product"),
    ],
)
def test_metric_normalization(alias, canonical):
    cfg = Config(dataset="sift", k=10, n_bkt=64, dis_metric=alias).update()
    assert cfg.dis_metric == canonical


def test_derived_names():
    cfg = Config(dataset="sift", k=10, n_bkt=64).update()
    assert cfg.pth_log == "./logs/sift/ML_kmeans_RE_FLAT/"
    assert "sift-k=10-ML_kmeans=64" in cfg.file_name
    assert cfg.log_name.endswith(".txt")
    assert cfg.df_name.endswith(".csv")


def test_cli_parse():
    cfg = parse_config(["--dataset", "sift", "--k", "10", "--n_bkt", "64", "--dis_metric", "ip"])
    assert cfg.dataset == "sift"
    assert cfg.k == 10
    assert cfg.n_bkt == 64
    assert cfg.dis_metric == "inner_product"


def test_cli_bool_flags():
    base = ["--dataset", "sift", "--k", "10", "--n_bkt", "64"]
    assert parse_config(base + ["--run_diagnostics", "False"]).run_diagnostics is False
    assert parse_config(base + ["--run_diagnostics", "true"]).run_diagnostics is True
    assert parse_config(base).run_diagnostics is False


def test_ascii_table():
    t = ascii_table(["A", "Long header"], [[1, 2.34567], [10, 0.5]])
    lines = t.splitlines()
    assert "Long header" in lines[1]
    assert "2.3457" in t
    assert all(len(line) == len(lines[0]) for line in lines)


def test_parse_config_records_explicit_flags():
    """Entry points with different defaults (largescale: n_epoch=30) must be
    able to tell an explicit `--n_epoch 10` from the dataclass default."""
    from lira_tpu.config import parse_config

    cfg = parse_config(["--dataset", "d", "--k", "5", "--n_bkt", "8",
                        "--n_epoch", "10"])
    assert "n_epoch" in cfg._explicit and cfg.n_epoch == 10
    assert "batch_size" not in cfg._explicit
    cfg2 = parse_config(["--dataset", "d", "--k", "5", "--n_bkt", "8"])
    assert "n_epoch" not in cfg2._explicit
    assert cfg2.n_epoch == cfg.n_epoch  # dataclass default == 10
