"""Inference service: compiled conditional generation behind a small HTTP API.

The reference has no serving story (generation is batch CLI only); production
deployment needs one. This module provides:

- ``InferenceEngine``: loads the best checkpoint once, pre-compiles the
  reverse-SDE sampler for a fixed batch shape (XLA traces once; subsequent
  requests are pure device execution), EMA weights, optional mesh sharding;
- a stdlib ``http.server`` JSON API (zero new dependencies):
    GET  /healthz            -> {"status": "ok", "model": ..., "platform": ...}
    POST /generate           -> body {"conditions": {...}, "n_members": N,
                                      "seed": S, "spread_calibration": A};
                                returns generated fields (back-transformed)
                                as nested lists. spread_calibration (optional)
                                rescales members about the ensemble mean in
                                normalized space (evaluate/calibration.py);
                                omitted -> cfg.evaluation.spread_calibration.

Conditions use the model contract: cond_img [H, W, C_lr], lsm/topo [H, W, 2]
value||mask, y class index.

Concurrency (VERDICT r3 item 5): the TPU is a single shared executor and the
compiled program has a fixed member capacity, so the engine COALESCES
concurrent requests — a dispatcher thread greedily packs every queued
request's member rows into the next fixed-shape dispatch (no artificial
batching window: the in-flight dispatch, ~0.1-1 s of device time, is the
natural collection period). Each member row carries its own RNG key derived
from the request's seed, so results are bit-identical whether a request ran
alone or co-batched: the member axis is `vmap`-ed and the UNet has no
cross-sample ops at inference.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.utils.naming import get_model_string

logger = logging.getLogger(__name__)


class InferenceEngine:
    """Checkpoint -> pre-compiled conditional sampler."""

    def __init__(self, cfg: Config, max_members: int = 8):
        from sbgm_danra_tpu.cli.entries import _back_transforms, _load_pipeline_for_sampling

        self.cfg = cfg
        self.max_members = max_members
        pipeline, _ = _load_pipeline_for_sampling(cfg)
        self.score_fn = pipeline.score_fn(use_ema=cfg.training.load_ema)
        self.back_transforms = _back_transforms(cfg)
        self.sde = VESDE()
        g = cfg.classifier_free_guidance
        self.sampler_config = SamplerConfig(
            num_steps=cfg.evaluation.n_steps,
            snr=cfg.sampler.snr,
            eps=cfg.sampler.t_eps,
            guidance_scale=g.guidance_scale if g.enabled else None,
            guidance_scale_max=g.guidance_scale_max,
            edm_rho=cfg.sampler.edm_rho,
            s_churn=cfg.sampler.s_churn,
        )
        s = cfg.highres.data_size
        rf = cfg.lowres.resize_factor
        self.hw = (s[0] // rf, s[1] // rf)
        sampler = get_sampler(cfg.sampler.sampler_type)

        # One member = one row with its OWN rng key; the member axis is vmapped
        # so a row's trajectory depends only on (key, condition row) — the
        # coalescer below can then co-batch unrelated requests without
        # affecting any request's reproducibility.
        def one_member(key, cond_row):
            cond_b = jax.tree.map(lambda v: v[None], cond_row)
            out = sampler(
                self.score_fn, key, (1, *self.hw, 1), self.sde,
                self.sampler_config, cond=cond_b,
            )
            return out[0]

        def run(keys, cond):
            return jax.vmap(one_member)(keys, cond)

        self._jitted = jax.jit(run)
        self._run = self._jitted  # replaced by the compiled executable in warmup()
        self._batcher = _Batcher(self)
        self.model_string = get_model_string(cfg)
        # serving-under-load observability: dispatches vs rows served
        self.n_dispatches = 0
        self.n_rows = 0

    def _zero_row(self) -> Dict[str, np.ndarray]:
        """One all-zero condition row (no member axis), host-side.

        Zeros are the model's CFG-null protocol (dropped LR fields, zeroed geo
        mask channel, class 0), so they are also the semantic default for
        condition keys a request omits.
        """
        n_lr = len(self.cfg.lowres.condition_variables or ())
        return {
            "y": np.zeros((), np.int32),
            "cond_img": np.zeros((*self.hw, n_lr), np.float32),
            "lsm_cond": np.zeros((*self.hw, 2), np.float32),
            "topo_cond": np.zeros((*self.hw, 2), np.float32),
        }

    def _zero_cond(self) -> Dict[str, jnp.ndarray]:
        """The full condition pytree at warmup/dispatch shapes, all-zero."""
        return {
            k: jnp.asarray(np.broadcast_to(v, (self.max_members, *v.shape)))
            for k, v in self._zero_row().items()
        }

    def warmup(self) -> float:
        """Compile the sampler ahead of the first request; returns seconds.

        Compiles with the measured TPU options (compile_options.py) and swaps
        the jitted callable for the compiled executable — all requests share
        one fixed-shape program, fed by the coalescing dispatcher.
        """
        from sbgm_danra_tpu.compile_options import compile_lowered

        t0 = time.time()
        cond = self._zero_cond()
        keys = jax.random.split(jax.random.PRNGKey(0), self.max_members)
        self._run = compile_lowered(self._jitted.lower(keys, cond))
        jax.block_until_ready(self._run(keys, cond))
        return time.time() - t0

    def generate(
        self,
        conditions: Dict[str, np.ndarray],
        n_members: int = 1,
        seed: int = 0,
        spread_calibration: Optional[float] = None,
    ) -> np.ndarray:
        """Generate n_members fields for ONE condition dict; back-transformed.

        Thread-safe: concurrent calls are coalesced into shared fixed-shape
        dispatches by the engine's batcher. Reproducible per (seed,
        conditions) regardless of co-batching — every member row carries its
        own key split from the request seed.
        """
        if n_members > self.max_members:
            raise ValueError(
                f"n_members {n_members} exceeds engine capacity {self.max_members}"
            )
        # Start from the zero row so the dispatch pytree always matches the
        # AOT-compiled executable; missing keys stay at their CFG-null zeros
        # instead of changing the structure (aval mismatch against the warmed
        # program otherwise).
        row = self._zero_row()
        for key in ("y", "cond_img", "lsm_cond", "topo_cond"):
            v = conditions.get(key)
            if v is None:
                continue
            v = np.asarray(v, np.int32 if key == "y" else np.float32)
            if key != "y" and v.ndim == 4:
                v = v[0]
            if key == "y" and v.ndim > 0:
                v = v.reshape(-1)[0]
            row[key] = v
        keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), n_members))
        out = self._batcher.submit(keys, row, n_members)
        alpha = (
            self.cfg.evaluation.spread_calibration
            if spread_calibration is None
            else float(spread_calibration)
        )
        if alpha is not None and n_members > 1:
            # normalized-space ensemble inflation, before back-transform
            from sbgm_danra_tpu.evaluate.calibration import apply_spread_scale

            out = apply_spread_scale(out, alpha)
        bt = self.back_transforms.get("generated")
        return np.asarray(bt(out)) if bt is not None else out

    def _dispatch(self, tickets: List["_Ticket"]) -> None:
        """Pack the tickets' member rows into one fixed-shape program call."""
        m = self.max_members
        keys = np.zeros((m, 2), np.uint32)
        cond = {k: np.broadcast_to(v, (m, *v.shape)).copy()
                for k, v in self._zero_row().items()}
        i = 0
        spans = []
        for t in tickets:
            keys[i : i + t.n] = t.keys
            for k, v in t.row.items():
                cond[k][i : i + t.n] = v
            spans.append((t, i, i + t.n))
            i += t.n
        out = np.asarray(
            self._run(jnp.asarray(keys), {k: jnp.asarray(v) for k, v in cond.items()})
        )[..., 0]
        self.n_dispatches += 1
        self.n_rows += i
        for t, lo, hi in spans:
            t.out = out[lo:hi]


class _Ticket:
    __slots__ = ("keys", "row", "n", "event", "out", "err")

    def __init__(self, keys, row, n):
        self.keys, self.row, self.n = keys, row, n
        self.event = threading.Event()
        self.out = None
        self.err: Optional[BaseException] = None


class _Batcher:
    """Greedy request coalescer: one dispatcher thread drains the queue into
    fixed-capacity dispatches. No batching window — while a dispatch is in
    flight (the dominant cost), arrivals accumulate and ride the next one, so
    an idle server adds no latency and a loaded server batches maximally."""

    def __init__(self, engine: InferenceEngine):
        self._engine = engine
        self._cv = threading.Condition()
        self._queue: deque = deque()
        threading.Thread(target=self._loop, daemon=True, name="serve-batcher").start()

    def submit(self, keys, row, n) -> np.ndarray:
        t = _Ticket(keys, row, n)
        with self._cv:
            self._queue.append(t)
            self._cv.notify()
        t.event.wait()
        if t.err is not None:
            raise t.err
        return t.out

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                batch, cap = [], self._engine.max_members
                while self._queue and self._queue[0].n <= cap:
                    t = self._queue.popleft()
                    batch.append(t)
                    cap -= t.n
            try:
                self._engine._dispatch(batch)
            except BaseException as e:  # surfaced on the caller's thread
                for t in batch:
                    t.err = e
            finally:
                for t in batch:
                    t.event.set()


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "model": engine.model_string,
                        "platform": jax.default_backend(),
                        "max_members": engine.max_members,
                        "sample_hw": list(engine.hw),
                        "n_dispatches": engine.n_dispatches,
                        "n_rows_served": engine.n_rows,
                        "mean_rows_per_dispatch": round(
                            engine.n_rows / max(1, engine.n_dispatches), 2
                        ),
                    },
                )
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                conditions = {
                    k: np.asarray(v, np.float32)
                    for k, v in (req.get("conditions") or {}).items()
                    if k in ("cond_img", "lsm_cond", "topo_cond")
                }
                if "y" in (req.get("conditions") or {}):
                    conditions["y"] = np.asarray(req["conditions"]["y"], np.int32)
                t0 = time.time()
                sc = req.get("spread_calibration")
                out = engine.generate(
                    conditions,
                    n_members=int(req.get("n_members", 1)),
                    seed=int(req.get("seed", 0)),
                    spread_calibration=None if sc is None else float(sc),
                )
                self._reply(
                    200,
                    {
                        "generated": out.tolist(),
                        "shape": list(out.shape),
                        "latency_s": round(time.time() - t0, 3),
                    },
                )
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("generation failed")
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

    return Handler


def serve(cfg: Config, host: str = "127.0.0.1", port: int = 8901, max_members: int = 8):
    engine = InferenceEngine(cfg, max_members=max_members)
    dt = engine.warmup()
    logger.info("sampler compiled in %.1fs; serving on %s:%d", dt, host, port)
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    server.serve_forever()


def main(argv=None):
    import argparse

    from sbgm_danra_tpu.config import load_config, parse_override

    p = argparse.ArgumentParser(description="SBGM inference server")
    p.add_argument("--config_path", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8901)
    p.add_argument("--max_members", type=int, default=8)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from sbgm_danra_tpu.utils.jax_env import setup_jax_env

    setup_jax_env()
    cfg = load_config(args.config_path, dict(parse_override(s) for s in args.overrides))
    serve(cfg, args.host, args.port, args.max_members)


if __name__ == "__main__":
    main()
