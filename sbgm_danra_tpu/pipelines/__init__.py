"""Host-side data pipelines: splits, statistics, comparison, correlations, ERA5 ETL."""
