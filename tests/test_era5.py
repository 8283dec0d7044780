"""ERA5 ETL: request construction, resume logic, streaming, worker completeness.

All external tools (cdsapi, cdo, rsync/ssh) are injected fakes — the logic
under test is the pipeline's: request payloads, skip/redo decisions, command
construction, year completeness, and file flow.
"""

import os

import numpy as np
import pytest

from sbgm_danra_tpu.pipelines.era5.cdo_utils import (
    convert_daily_to_npz,
    convert_to_daily_stat,
    daily_stat_for,
    find_data_var,
    regrid_to_danra,
)
from sbgm_danra_tpu.pipelines.era5.download import (
    DownloadSpec,
    build_request,
    dataset_name,
    download_year,
    pull_all,
    target_path,
)
from sbgm_danra_tpu.pipelines.era5.stream import download_transfer_delete, years_to_process
from sbgm_danra_tpu.pipelines.era5.transfer import remote_years_present, rsync_push
from sbgm_danra_tpu.pipelines.era5.worker import (
    days_in_year,
    process_year,
    run_worker,
    year_complete,
)


class FakeClient:
    def __init__(self):
        self.calls = []

    def __call__(self, dataset, request, target):
        self.calls.append((dataset, request, target))
        with open(target, "w") as f:
            f.write("fake-nc")


class TestDownload:
    def test_request_payload(self):
        req = build_request("temp", 1995, (60, -80, 40, 40))
        assert req["variable"] == "2m_temperature"
        assert req["year"] == "1995"
        assert len(req["month"]) == 12 and len(req["time"]) == 24
        assert dataset_name(None) == "reanalysis-era5-single-levels"

    def test_pressure_level_request(self):
        req = build_request("z", 2000, (60, -80, 40, 40), pressure_level=500)
        assert req["pressure_level"] == "500"
        assert dataset_name(500) == "reanalysis-era5-pressure-levels"

    def test_unknown_variable(self):
        with pytest.raises(ValueError):
            build_request("bogus", 2000, (60, -80, 40, 40))

    def test_download_skips_existing(self, tmp_path):
        client = FakeClient()
        spec = DownloadSpec(("temp",), (1999,), out_dir=str(tmp_path))
        p1 = download_year(client, spec, "temp", 1999)
        p2 = download_year(client, spec, "temp", 1999)
        assert p1 == p2 and len(client.calls) == 1  # resume: no re-download

    def test_pull_all_fanout(self, tmp_path):
        client = FakeClient()
        spec = DownloadSpec(
            ("temp", "prcp"), (2000, 2001), out_dir=str(tmp_path), max_workers=2
        )
        out = pull_all(client, spec)
        assert len(out) == 4 and len(client.calls) == 4

    def test_pressure_fanout(self, tmp_path):
        client = FakeClient()
        spec = DownloadSpec(
            ("z",), (2000,), out_dir=str(tmp_path), pressure_levels=(250, 500)
        )
        out = pull_all(client, spec)
        assert {os.path.basename(p) for p in out} == {
            "era5_z_pl250_2000.nc", "era5_z_pl500_2000.nc",
        }


class TestCDO:
    def test_daily_stats_per_variable(self):
        assert daily_stat_for("prcp") == "daysum"
        assert daily_stat_for("cape") == "daymax"
        assert daily_stat_for("temp") == "daymean"

    def test_command_construction(self):
        calls = []
        runner = calls.append
        convert_to_daily_stat("in.nc", "out.nc", "prcp", runner)
        regrid_to_danra("out.nc", "re.nc", "danra.grid", None, runner)
        regrid_to_danra("out.nc", "re.nc", "danra.grid", "w.nc", runner)  # no weights file yet
        assert calls[0] == ["cdo", "-O", "daysum", "in.nc", "out.nc"]
        assert calls[1] == ["cdo", "-O", "remapbil,danra.grid", "out.nc", "re.nc"]
        assert calls[2][2].startswith("remapbil")  # weights file absent -> inline

    def test_find_data_var(self):
        assert find_data_var(["time", "lat", "lon", "t2m"], "temp") == "t2m"
        assert find_data_var(["time", "lat", "lon", "weird"], "temp") == "weird"
        with pytest.raises(ValueError):
            find_data_var(["time", "a", "b"], "temp")

    def test_daily_npz_naming(self, tmp_path):
        n = convert_daily_to_npz(
            ["20000101", "20000102"],
            np.zeros((2, 4, 6), np.float32),
            str(tmp_path), "prcp", (4, 6),
        )
        assert n == 2
        assert os.path.exists(tmp_path / "prcp_4x6_20000101.npz")


class TestStreamResume:
    def test_years_to_process_redoes_newest(self):
        # reference stream.py:100-123 — skip complete years except the max
        assert years_to_process([1995, 1996, 1997, 1998], {1995, 1996}) == [
            1996, 1997, 1998,
        ]
        assert years_to_process([1995, 1996], set()) == [1995, 1996]

    def test_download_transfer_delete(self, tmp_path):
        client = FakeClient()
        spec = DownloadSpec(("temp",), (1999, 2000), out_dir=str(tmp_path))
        pushed = []

        def fake_runner(argv):
            if argv[0] == "ssh":
                return "era5_temp_1999.nc\n"  # 1999 already remote (will redo: max)
            pushed.append(argv)
            return ""

        done = download_transfer_delete(
            client, spec, "user@cluster", "/scratch/era5", runner=fake_runner
        )
        assert done["temp"] == [1999, 2000]
        assert len(pushed) == 2
        # local files deleted after push
        assert not list(tmp_path.glob("*.nc"))


class TestWorker:
    @staticmethod
    def _fake_reader(year, h=4, w=6):
        def reader(path):
            n = days_in_year(year)
            dates = []
            import datetime as dt

            d = dt.date(year, 1, 1)
            for _ in range(n):
                dates.append(d.strftime("%Y%m%d"))
                d += dt.timedelta(days=1)
            return dates, np.zeros((n, h, w), np.float32)

        return reader

    def test_year_complete_and_partial_cleanup(self, tmp_path):
        out = str(tmp_path)
        # write a partial year (2 days)
        for d in ("20010101", "20010102"):
            np.savez(os.path.join(out, f"temp_4x6_{d}.npz"), data=np.zeros((4, 6)))
        assert not year_complete(out, "temp", 2001, (4, 6))
        # partial files were cleaned for redo
        assert not list(tmp_path.glob("*.npz"))

    def test_process_year_and_completeness(self, tmp_path):
        raw = tmp_path / "era5_temp_2001.nc"
        raw.write_text("fake")
        calls = []
        n = process_year(
            str(raw), "temp", 2001, str(tmp_path / "out"), "danra.grid",
            self._fake_reader(2001, 4, 6), (4, 6), runner=calls.append,
        )
        assert n == 365
        assert year_complete(str(tmp_path / "out"), "temp", 2001, (4, 6))
        assert [c[2].split(",")[0] for c in calls] == ["daymean", "remapbil"]

    def test_run_worker_skips_complete(self, tmp_path):
        raw_dir = tmp_path / "raw"
        raw_dir.mkdir()
        (raw_dir / "era5_temp_2001.nc").write_text("fake")
        (raw_dir / "era5_temp_2002.nc").write_text("fake")
        out_root = str(tmp_path / "out")

        def reader(path):
            year = 2001 if "2001" in path else 2002
            return self._fake_reader(year, 4, 6)(path)

        done1 = run_worker(
            str(raw_dir), out_root, ["temp"], [2001, 2002], "g", reader, (4, 6),
            runner=lambda argv: None, max_workers=2,
        )
        assert sorted(done1["temp"]) == [2001, 2002]
        # second run: everything complete -> nothing processed
        done2 = run_worker(
            str(raw_dir), out_root, ["temp"], [2001, 2002], "g", reader, (4, 6),
            runner=lambda argv: None,
        )
        assert done2["temp"] == []


class TestTransfer:
    def test_rsync_command(self):
        calls = []
        rsync_push("/tmp/f.nc", "u@host", "/data", runner=lambda a: calls.append(a) or "")
        assert calls[0][0] == "rsync" and calls[0][-1] == "u@host:/data/"

    def test_remote_inventory(self):
        listing = "era5_temp_1995.nc era5_temp_1996.nc era5_prcp_1997.nc"
        years = remote_years_present("u@h", "/d", "temp", runner=lambda a: listing)
        assert years == {1995, 1996}

    def test_missing_binary_gate(self):
        from sbgm_danra_tpu.pipelines.era5.cdo_utils import subprocess_runner

        with pytest.raises(RuntimeError, match="not installed"):
            subprocess_runner(["definitely_not_a_real_binary_xyz", "--flag"])


class TestPipelineConfig:
    """era5_pipeline.yaml schema -> typed config -> CLI dry runs."""

    def test_load_single_level_config(self):
        from sbgm_danra_tpu.pipelines.era5.config import load_era5_config

        cfg = load_era5_config("configs/era5_pipeline.yaml")
        assert set(cfg.variables) == {"temp", "prcp", "pev", "cape", "nwvf", "ewvf", "msl"}
        assert cfg.years == (1991, 2020)
        assert len(cfg.year_list) == 30
        assert cfg.pressure_levels == ()
        assert cfg.variables["prcp"].daily_stat == "daysum"
        assert cfg.variables["cape"].daily_stat == "daymax"
        assert cfg.remote is not None and cfg.remote.target.endswith("@cluster.example.org")
        spec = cfg.download_spec()
        assert set(spec.variables) == set(cfg.variables)
        assert spec.area == (60, -80, 40, 40)

    def test_load_pressure_config_registers_variables(self):
        from sbgm_danra_tpu.pipelines.era5.config import load_era5_config

        cfg = load_era5_config("configs/era5_pressure_pipeline.yaml")
        assert cfg.pressure_levels == (250, 500, 850, 1000)
        # config-declared variables resolve in build_request
        req = build_request("z", 2000, cfg.area, pressure_level=500)
        assert req["variable"] == "geopotential"
        assert req["pressure_level"] == "500"

    def test_config_daily_stats_registered(self):
        from sbgm_danra_tpu.pipelines.era5.config import load_era5_config

        load_era5_config("configs/era5_pipeline.yaml")
        assert daily_stat_for("pev") == "daysum"
        assert daily_stat_for("msl") == "daymean"

    def test_cli_dry_run(self, capsys):
        from sbgm_danra_tpu.cli.main_era5_app import main

        main(["--config_path", "configs/era5_pipeline.yaml", "--mode", "download",
              "--dry_run"])
        out = capsys.readouterr().out
        assert "jobs=210" in out  # 7 variables x 30 years

    def test_cli_dry_run_pressure(self, capsys):
        from sbgm_danra_tpu.cli.main_era5_app import main

        main(["--config_path", "configs/era5_pressure_pipeline.yaml", "--mode",
              "download", "--dry_run"])
        out = capsys.readouterr().out
        assert "jobs=120" in out  # 1 variable x 30 years x 4 levels

    def test_cli_download_with_fake_client(self, tmp_path, monkeypatch):
        import sbgm_danra_tpu.pipelines.era5.download as dl
        from sbgm_danra_tpu.cli.main_era5_app import main

        fake = FakeClient()
        monkeypatch.setattr(dl, "make_cds_client", lambda: fake)
        cfg_path = tmp_path / "era5.yaml"
        cfg_path.write_text(
            "variables:\n  2m_temperature: {short: temp, daily_stat: daymean}\n"
            f"years: [2000, 2001]\ntmp_dir: {tmp_path}/raw\n"
        )
        main(["--config_path", str(cfg_path), "--mode", "download"])
        assert len(fake.calls) == 2
        assert os.path.exists(tmp_path / "raw" / "era5_temp_2000.nc")

    def test_cli_stream_requires_remote(self, tmp_path):
        from sbgm_danra_tpu.cli.main_era5_app import main

        cfg_path = tmp_path / "era5.yaml"
        cfg_path.write_text("variables: {}\nyears: [2000, 2000]\n")
        with pytest.raises(SystemExit, match="remote"):
            main(["--config_path", str(cfg_path), "--mode", "stream"])


class TestPressureAndLayout:
    """Code-review fixes: pressure levels flow through stream/process, and the
    reference's {var} remote-directory placeholder resolves per variable."""

    def test_stream_honors_pressure_levels_and_var_dirs(self, tmp_path):
        fake = FakeClient()
        calls = []

        def runner(argv):
            calls.append(list(argv))
            return ""  # no remote years present

        spec = DownloadSpec(
            variables=("z",), years=(2000,), out_dir=str(tmp_path),
            pressure_levels=(250, 500),
        )
        done = download_transfer_delete(fake, spec, "u@h", "/scratch/raw/{var}/",
                                        runner=runner)
        assert done["z"] == [2000]
        # one CDS request per level, against the pressure-level dataset
        assert len(fake.calls) == 2
        assert all(c[0] == "reanalysis-era5-pressure-levels" for c in fake.calls)
        assert {c[1]["pressure_level"] for c in fake.calls} == {"250", "500"}
        # rsync target substitutes {var}
        rsyncs = [c for c in calls if c[0] == "rsync"]
        assert rsyncs and all(c[-1] == "u@h:/scratch/raw/z/" for c in rsyncs)

    def test_worker_pressure_levels_make_pl_variables(self, tmp_path):
        import numpy as np

        raw = tmp_path / "raw"
        raw.mkdir()
        # level-suffixed raw files as download.target_path writes them
        for pl in (250, 500):
            (raw / f"era5_z_pl{pl}_2001.nc").write_text("fake")

        def fake_reader(path):
            days = [f"2001{m:02d}{d:02d}" for m in range(1, 13)
                    for d in range(1, 32) if not (m == 2 and d > 28)
                    and not (m in (4, 6, 9, 11) and d > 30)]
            fields = np.zeros((len(days), 4, 6), np.float32)
            return days, fields

        done = run_worker(
            str(raw), str(tmp_path / "out"), ["z"], [2001], "grid.txt",
            fake_reader, domain_dims=(4, 6), runner=lambda argv: None,
            pressure_levels=(250, 500),
        )
        assert done["z_pl_250"] == [2001] and done["z_pl_500"] == [2001]
        import glob

        files = glob.glob(str(tmp_path / "out" / "z_pl_500" / "*.npz"))
        assert len(files) == 365
        assert files[0].split("/")[-1].startswith("z_pl_500_4x6_2001")

    def test_worker_var_dirs_with_pressure_levels(self, tmp_path):
        """Round-trip of the lumi layout: stream rsyncs raw files into
        remote_dir.format(var=<bare var>) (filenames carry the level suffix),
        so run_worker must resolve {var} raw dirs with the BARE variable —
        formatting with the level-suffixed output name silently dropped every
        year as 'missing raw file'."""
        import numpy as np

        raw_root = tmp_path / "raw"
        (raw_root / "z").mkdir(parents=True)  # bare-var dir, as stream.py pushes
        for pl in (250, 500):
            (raw_root / "z" / f"era5_z_pl{pl}_2001.nc").write_text("fake")

        def fake_reader(path):
            days = [f"2001{m:02d}{d:02d}" for m in range(1, 13)
                    for d in range(1, 32) if not (m == 2 and d > 28)
                    and not (m in (4, 6, 9, 11) and d > 30)]
            return days, np.zeros((len(days), 4, 6), np.float32)

        done = run_worker(
            str(raw_root / "{var}"), str(tmp_path / "out" / "{var}"), ["z"],
            [2001], "grid.txt", fake_reader, domain_dims=(4, 6),
            runner=lambda argv: None, pressure_levels=(250, 500),
        )
        assert done["z_pl_250"] == [2001]
        assert done["z_pl_500"] == [2001]

    def test_stream_resume_per_level(self, tmp_path):
        """Per-(var, level) inventories: only missing (year, level) files are
        re-downloaded, plus one suspect redo — the last-pushed level of the
        newest remote year (its rsync may be partial after a crash)."""
        fake = FakeClient()
        listing = (
            "era5_z_pl250_2000.nc era5_z_pl250_2001.nc "
            "era5_z_pl500_2000.nc era5_z_pl500_2001.nc "
            "era5_z_pl850_2000.nc"
        )

        def runner(argv):
            return listing if argv[0] == "ssh" else ""

        spec = DownloadSpec(
            variables=("z",), years=(2000, 2001), out_dir=str(tmp_path),
            pressure_levels=(250, 500, 850),
        )
        done = download_transfer_delete(fake, spec, "u@h", "/scratch/{var}/",
                                        runner=runner)
        assert done["z"] == [2001]
        got = {(c[1]["pressure_level"], c[1]["year"]) for c in fake.calls}
        # missing: pl850/2001; suspect redo: pl500/2001 (last pushed of 2001).
        # pl250/2001 and all of 2000 are NOT re-downloaded.
        assert got == {("850", "2001"), ("500", "2001")}
