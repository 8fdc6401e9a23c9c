"""Self-driving serve loop: the server owns the dispatch cadence.

`StreamServer.serve(rate_hz=60)` starts a background analysis thread that
paces hops on a monotonic deadline grid and atomically publishes each hop's
(outputs, gains) for any number of consumers — the server-side counterpart
of the reference viewer's Update schedule invoking `update_vqt_system`
every frame (pitchvis_viewer/src/app/common.rs:2082-2118): there the
windowing framework drives the cadence; here the serving runtime does, so
producers push() and consumers latest()/wait_next() without anyone running
a step loop of their own.

Lateness policy: a stalled host (GC pause, throttle window) SKIPS the
missed deadlines instead of bursting dispatches to catch up — the delta
ingest already drains the accumulated audio backlog via its bounded
catch-up hops inside the next step (runtime/server.py::_dispatch_delta),
which keeps the audio clock correct without flooding the device queue.

Three publish modes:

* ``publish="latest"`` k=1 (default): one step() per grid slot, optionally
  pipelined one deep.
* ``publish="latest"`` k>1 (throughput): each dispatch scan-amortizes k
  ingest-fed hops and publishes the newest — max capacity, bursty cadence.
* ``publish="per_hop"`` (cadenced, interactive): each dispatch fuses k
  hops and returns EVERY hop's outputs as a k-tuple sliced on device; the
  loop barriers once per dispatch, publishes each hop on its own grid
  slot, and overlaps the previous window's barrier+publishes with the next
  window's device compute — the per-hop transport round-trip leaves the
  cadence (see _run_cadenced).
"""

from __future__ import annotations

import threading
import time

import jax
import numpy as np


class ServeLoop:
    """Handle for a running serve loop (created by ``StreamServer.serve``).

    Consumer API (any thread):

    * ``latest()`` — newest published ``(seq, outputs, gains)`` or ``None``
      before the first hop completes. ``seq`` increments per published hop.
    * ``wait_next(seq=None, timeout=None)`` — block until a hop newer than
      ``seq`` (default: newest already published) lands; ``None`` on
      timeout or once the loop has stopped.
    * ``stop()`` — stop pacing, join the thread, publish the in-flight
      pipelined tail, and re-raise any error the loop thread hit. Safe to
      call from the ``on_outputs`` callback (i.e. the loop thread itself):
      it then only signals and returns — a later ``stop()``/``close()``
      from any other thread completes the teardown. Idempotent.

    Also a context manager (``with server.serve() as loop:`` stops on
    exit; if the body is already raising, teardown never masks that
    exception — a loop error stays readable on ``.error``).
    """

    def __init__(
        self,
        server,
        rate_hz: float,
        pipelined: bool,
        on_outputs=None,
        sync: str = "element",
        hops_per_dispatch: int = 1,
        publish: str = "latest",
    ):
        if rate_hz <= 0:
            raise ValueError("rate_hz must be positive")
        if sync not in ("element", "host", "none"):
            raise ValueError(f"sync must be 'element', 'host' or 'none', got {sync!r}")
        if hops_per_dispatch < 1:
            raise ValueError("hops_per_dispatch must be >= 1")
        if publish not in ("latest", "per_hop"):
            raise ValueError(f"publish must be 'latest' or 'per_hop', got {publish!r}")
        if (hops_per_dispatch > 1 or publish == "per_hop") and server.ingest != "delta":
            raise ValueError(
                "hops_per_dispatch > 1 / publish='per_hop' require ingest='delta'"
            )
        self._server = server
        self._k = int(hops_per_dispatch)
        # multi-hop modes dispatch k hops at a time; the deadline grid
        # spaces DISPATCHES so the audio cadence still averages rate_hz
        self._period = self._k / float(rate_hz)
        self._per_hop = publish == "per_hop"
        self._pipelined = pipelined and self._k == 1 and not self._per_hop
        # cadenced mode's one-deep dispatch overlap: window i-1's barrier +
        # paced publishes run while window i computes on device
        self._pipelined_multi = pipelined and self._per_hop
        self._sync = sync
        self._on_outputs = on_outputs
        self._cond = threading.Condition()
        self._latest = None  # (seq, outputs, gains)
        self._seq = 0
        self._done = False  # loop thread has exited (set under _cond)
        self._stop_evt = threading.Event()
        self.error: BaseException | None = None
        # hops = step() calls; published may lag by one when pipelined;
        # skipped_deadlines counts grid slots dropped while the host
        # stalled; catchup_windows counts the cadenced mode's double-width
        # backlog-draining dispatches
        self.stats = {
            "hops": 0, "published": 0, "skipped_deadlines": 0,
            "catchup_windows": 0,
        }
        self._thread = threading.Thread(
            target=self._run, name="pitchvis-serve-loop", daemon=True
        )
        self._thread.start()

    # -- loop thread -----------------------------------------------------------
    def _publish(self, outputs, gains, synced: bool = False) -> None:
        """``synced=True`` skips the per-publish barrier — the cadenced mode
        barriers once per k-hop dispatch and then publishes device-complete
        slices."""
        if not synced:
            outputs = self._synced(outputs)
        with self._cond:
            self._seq += 1
            self.stats["published"] = self._seq
            self._latest = (self._seq, outputs, gains)
            self._cond.notify_all()

    def _synced(self, outputs):
        """Applies the publish sync policy. Rationale: step() results are
        ASYNC jax arrays; publishing raw dispatches at full rate floods a
        networked device queue and starves consumer reads behind in-flight
        work (measured on the axon tunnel: consumers saw 17 of 5,473
        published hops, p50 gap 2.8 s). The 'element' barrier (default)
        fetches ONE scalar per hop — the loop self-paces to the real hop
        round-trip, so published hops are device-complete and a consumer
        read only pays its own transfer. 'host' additionally materializes
        the whole pytree (pair with fetch='led' compact outputs). 'none'
        publishes raw dispatch handles (co-located chips, max rate)."""
        if self._sync == "none":
            return outputs
        if self._sync == "host":
            return jax.tree.map(lambda a: np.asarray(a), outputs)
        leaf = jax.tree.leaves(outputs)[0]
        np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])  # completion barrier
        return outputs

    def _run_latest(self) -> None:
        """The original pacing loop: one publish per dispatch (k=1 single
        hops, optionally pipelined; k>1 throughput mode publishing the
        newest of each k-hop dispatch)."""
        next_t = time.monotonic()
        while not self._stop_evt.is_set():
            if self._k > 1:
                # throughput mode: k ingest-fed hops in ONE fused
                # dispatch (the amortized step_multi program); the
                # newest hop's outputs are published
                result = self._server.step_multi(self._k)
            else:
                result = self._server.step(pipelined=self._pipelined)
            self.stats["hops"] += self._k
            if result is not None:  # None = pipelined priming hop
                self._publish(*result)
                if self._on_outputs is not None:
                    self._on_outputs(*self._latest)
            next_t += self._period
            now = time.monotonic()
            if now > next_t:
                skipped = int((now - next_t) / self._period)
                self.stats["skipped_deadlines"] += skipped
                next_t += skipped * self._period
            else:
                self._stop_evt.wait(next_t - now)

    def _run_cadenced(self) -> None:
        """The CADENCED mode (``publish="per_hop"``): each dispatch is one
        fused k-hop program (``step_multi(per_hop=True)``) whose per-hop
        outputs come back stacked; the loop barriers ONCE per dispatch and
        then publishes each hop on its own 1/rate_hz grid slot. The device
        owns the audio clock for k hops at a time, so the interactive
        cadence pays one transport round-trip per k hops instead of per hop
        — through a networked tunnel whose round-trip exceeds the hop
        period, this is what makes 60 device-complete published hops/s
        reachable (the reference's every-frame in-process update cadence,
        pitchvis_viewer/src/app/common.rs:2082-2118). Consumers see hops
        k..2k-1 while hops 2k..3k-1 compute; end-to-end added latency is
        ~one dispatch window (k/rate_hz) + the round-trip."""
        hop_period = self._period / self._k
        prev = None  # the previous window's async (outputs_k, gains_k)

        def publish_window(outputs_k, gains_k, t_d):
            # ONE barrier per dispatch, then each hop on its grid slot
            # (t_d=None publishes immediately: catch-up bursts and the
            # shutdown drain); a stop() request short-circuits the waits
            # but still publishes the computed tail (no ingested hop lost).
            # outputs_k is a TUPLE of per-hop trees sliced inside the one
            # dispatch (runtime/server.py::fused_delta_multi_perhop) —
            # publishing costs no further device calls
            outputs_k = self._synced(outputs_k)
            for i in range(len(outputs_k)):
                if t_d is not None and not self._stop_evt.is_set():
                    wait = t_d + (i + 1) * hop_period - time.monotonic()
                    if wait > 0:
                        self._stop_evt.wait(wait)
                self._publish(outputs_k[i], gains_k[i], synced=True)
                if self._on_outputs is not None:
                    self._on_outputs(*self._latest)

        body_exc = None
        behind = False
        try:
            next_t = time.monotonic()
            while not self._stop_evt.is_set():
                t_d = next_t
                # CATCH-UP: a window that overran the grid leaves >= k hops
                # of audio backlog; the next dispatch doubles its width and
                # its publishes burst instead of pacing, so a degraded host
                # window DRAINS the backlog (the throughput mode's draining,
                # fused into the interactive loop) instead of letting the
                # ingest rings max_lag-skip audio while the grid idles
                k_used = 2 * self._k if behind else self._k
                # dispatch window i WITHOUT a barrier; when pipelined
                # (default), window i-1's barrier + paced publishes then
                # overlap window i's device compute, so the tunnel
                # round-trip and the fused compute both hide inside the
                # k/rate_hz publish window instead of preceding it
                cur = self._server.step_multi(k_used, per_hop=True)
                self.stats["hops"] += k_used
                if behind:
                    self.stats["catchup_windows"] += 1
                grid = None if behind else t_d
                if not self._pipelined_multi:
                    publish_window(*cur, grid)
                elif prev is not None:
                    publish_window(*prev, grid)
                prev = cur
                next_t += self._period * (k_used // self._k)
                now = time.monotonic()
                if now > next_t:
                    skipped = int((now - next_t) / self._period)
                    self.stats["skipped_deadlines"] += skipped * self._k
                    next_t += skipped * self._period
                    behind = True
                else:
                    behind = False
                    # in pipelined steady state the final publish slot IS
                    # next_t, so this wait is ~0; it paces the first
                    # (publish-free) window and the non-pipelined early-done
                    # case
                    self._stop_evt.wait(next_t - now)
        except BaseException as e:
            body_exc = e
            raise
        finally:
            # drain the in-flight window on exit so its ingested hops are
            # published before _done wakes any waiter; a drain failure must
            # not mask the loop body's own exception (it re-raises only
            # when the body exited cleanly)
            if self._pipelined_multi and prev is not None:
                try:
                    publish_window(*prev, None)
                except BaseException:
                    if body_exc is None:
                        raise

    def _run(self) -> None:
        try:
            if self._per_hop:
                self._run_cadenced()
            else:
                self._run_latest()
        except BaseException as e:  # surfaced via stop()/wait_next()
            self.error = e
        finally:
            # the loop thread drains its own pipeline slot ON EXIT, before
            # declaring itself done: a waiter woken by _done must already
            # be able to see the tail hop (publishing after the join in
            # stop() would race consumers into missing the final frame),
            # and a hop left in _pending would leak into the next serve
            # loop's first publish as an arbitrarily old frame
            try:
                tail = self._server.flush()
                if self.error is None and self._pipelined and tail is not None:
                    self._publish(*tail)
                    if self._on_outputs is not None:
                        self._on_outputs(*self._latest)
            except BaseException as e:
                if self.error is None:
                    self.error = e
            # _done set BEFORE notify so a waiter that wakes cannot re-sleep
            # past a clean shutdown (is_alive() races the thread's last
            # instants; this flag does not)
            with self._cond:
                self._done = True
                self._cond.notify_all()

    # -- consumer API ----------------------------------------------------------
    @property
    def running(self) -> bool:
        return self._thread.is_alive()

    def latest(self):
        with self._cond:
            return self._latest

    def wait_next(self, seq: int | None = None, timeout: float | None = None):
        """Blocks until a hop with sequence number > ``seq`` is published
        (``seq=None`` = newer than anything already published). Returns the
        ``(seq, outputs, gains)`` triple, or ``None`` if the timeout expires
        or the loop stops first. Raises if the loop thread failed."""
        with self._cond:
            target = self._seq if seq is None else seq
            self._cond.wait_for(
                lambda: self._seq > target or self.error is not None or self._done,
                timeout,
            )
            if self.error is not None:
                raise RuntimeError("serve loop failed") from self.error
            return self._latest if self._seq > target else None

    def _teardown(self, raise_error: bool):
        """Joins the loop thread and unwinds shared state; both shutdown
        paths (stop, context-manager exit) funnel through here so they
        cannot drift. The pipelined tail was already flushed + published by
        the loop thread's own exit path (so waiters woken by _done never
        miss it, and nothing stale survives for a later loop). Idempotent."""
        self._thread.join()
        with self._server._state_lock:
            if self._server._serve_loop is self:
                self._server._serve_loop = None
        if self.error is not None and raise_error:
            raise RuntimeError("serve loop failed") from self.error
        return self.latest()

    def stop(self):
        """Stops pacing and joins the loop thread; the loop's exit path
        publishes the pipelined in-flight tail so no ingested hop is lost;
        re-raises a loop error. From the loop thread itself
        (``on_outputs``), only signals — the tail still publishes when the
        loop unwinds."""
        self._stop_evt.set()
        if threading.current_thread() is self._thread:
            return self.latest()
        return self._teardown(raise_error=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._stop_evt.set()
        # when the body is already raising, never mask its exception with a
        # loop error (it stays readable on .error); otherwise surface it
        self._teardown(raise_error=exc[0] is None)
        return False
