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
    ):
        if rate_hz <= 0:
            raise ValueError("rate_hz must be positive")
        if sync not in ("element", "host", "none"):
            raise ValueError(f"sync must be 'element', 'host' or 'none', got {sync!r}")
        if hops_per_dispatch < 1:
            raise ValueError("hops_per_dispatch must be >= 1")
        if hops_per_dispatch > 1 and server.ingest != "delta":
            raise ValueError("hops_per_dispatch > 1 requires ingest='delta'")
        self._server = server
        self._k = int(hops_per_dispatch)
        # throughput mode dispatches k hops at a time; the deadline grid
        # spaces DISPATCHES so the audio cadence still averages rate_hz
        self._period = self._k / float(rate_hz)
        self._pipelined = pipelined and self._k == 1
        self._sync = sync
        self._on_outputs = on_outputs
        self._cond = threading.Condition()
        self._latest = None  # (seq, outputs, gains)
        self._seq = 0
        self._done = False  # loop thread has exited (set under _cond)
        self._stop_evt = threading.Event()
        self.error: BaseException | None = None
        # hops = step() calls; published may lag by one when pipelined;
        # skipped_deadlines counts grid slots dropped while the host stalled
        self.stats = {"hops": 0, "published": 0, "skipped_deadlines": 0}
        self._thread = threading.Thread(
            target=self._run, name="pitchvis-serve-loop", daemon=True
        )
        self._thread.start()

    # -- loop thread -----------------------------------------------------------
    def _publish(self, outputs, gains) -> None:
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

    def _run(self) -> None:
        try:
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
