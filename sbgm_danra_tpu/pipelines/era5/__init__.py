"""ERA5 acquisition ETL: CDS downloads, CDO regridding, transfer, streaming.

Re-design of the reference era5_download_pipeline/. All external dependencies
(cdsapi, the cdo binary, rsync/ssh) are injected as callables so the pipeline
logic — resume, year-completeness, streaming, regridding command construction —
is testable without network or binaries, and cleanly gated when they are absent
(this image has none of them).
"""
