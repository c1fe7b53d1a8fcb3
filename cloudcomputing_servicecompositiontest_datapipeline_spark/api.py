"""Public engine facade (SURVEY.md §3.3): the interactive surface a reference
user lands on — ``read_runs`` → ``report`` → pandas, plus raw SQL.

Mirrors the reference's Jupyter flow (interactive_helpers.py:196-330: run
experiment → compile CSV → ``pd.read_csv``): here the "experiment results"
are any records table, the report is the ReportConfig-driven plan, and
``toPandas()`` is the final hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.report import ReportConfig, combine_sheets, report
from .session import apply_runtime_conf, get_spark
from .sources import io as sio
from .sources import star


class Engine:
    """One-stop entry: ``Engine().read_runs(path)`` / ``.report(df, cfg)`` /
    ``.sql(...)``."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = apply_runtime_conf(spark or get_spark())

    # --- sources -----------------------------------------------------------
    def read_runs(self, path: str, schema=None) -> DataFrame:
        """S6: folder of one-JSON-per-run files → records table."""
        return sio.read_runs(self.spark, path, schema)

    def read_csv(self, path: str, schema=None) -> DataFrame:
        return sio.read_csv(self.spark, path, schema)

    def load_star(self, sf_dir: str) -> dict[str, DataFrame]:
        return star.load_tables(self.spark, sf_dir)

    def register_star_views(self, sf_dir: str) -> None:
        star.register_views(self.spark, sf_dir)

    def compile_results(self, run_dirs: list[str], vm_col: str = "vmID") -> DataFrame:
        """U2 (compile_results.py:62-72): merge several experiment history
        folders into one records table — union-of-keys schema with iteration
        tagging and iteration-scoped vm keys."""
        return combine_sheets([self.read_runs(d) for d in run_dirs], vm_col=vm_col)

    # --- analytics ---------------------------------------------------------
    def report(self, runs: DataFrame, cfg: ReportConfig) -> dict[str, DataFrame]:
        """The FaaS-Runner report plan (raw + per-group sections)."""
        return report(runs, cfg)

    def write_report(self, sections: dict[str, DataFrame], out_dir: str) -> dict[str, str]:
        """S9: emit the report as one CSV directory per section."""
        return sio.write_report_csv(sections, out_dir)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
