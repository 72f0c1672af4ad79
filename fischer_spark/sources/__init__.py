from fischer_spark.sources.pages import scan_pages, synth_pages
from fischer_spark.sources.testdata import scan_testdata

__all__ = ["scan_pages", "synth_pages", "scan_testdata"]
