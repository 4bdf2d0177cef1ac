"""Batched cube fitter.

TPU-native rebuild of the reference ``CubeFitter``
(reference: main.py:380-527).  Architectural translation:

reference (per pixel, per process)          this framework (batched)
------------------------------------------  ----------------------------------
fork nproc processes, stripe pixels         pixel batch axis, sharded over the
(main.py:505-523)                           device mesh (dp axis)
per-pixel MultiNest run                     lockstep batch of nested-sampling
                                            runs (sampling.run_nested)
SNR-scaled nlive per pixel                  pixels bucketed into a few nlive
(main.py:444-447)                           classes (static shapes per bucket)
iterative 1..ncomp_max ladder w/ early      batch-wide ladder: fit N for the
exit (main.py:448-472)                      survivors of N-1 only (compaction),
                                            Bayes-factor gate per pixel
one HDF chunk file per process              one HDF chunk file per batch
(main.py:424-435)                           (same store layout)
"FIXME no error handling if a process       per-batch retry with a fresh PRNG
fails" (main.py:514)                        key; completed pixels recorded in a
                                            chunk manifest so ``fit_cube``
                                            resumes by skipping them
"""

import dataclasses
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

from nestfit_tpu.cube.store import HdfStore, write_fit_group
from nestfit_tpu.sampling import NSConfig
from nestfit_tpu.sampling.fit import fit_batch
from nestfit_tpu.utils import get_logger

log = get_logger("nestfit_tpu.fitter")


def bucket_nlive(nlive_arr, n_buckets=4, quantum=50):
    """Quantize per-pixel live-point counts into at most ``n_buckets``
    classes (static shapes require one compiled sampler per class; the
    reference sets nlive per pixel exactly, main.py:444-447)."""
    nlive_arr = np.asarray(nlive_arr)
    qs = np.unique(
        np.quantile(nlive_arr, np.linspace(0, 1, n_buckets + 1)[1:])
    )
    # snap bucket ceilings up to the quantum
    levels = np.unique((np.ceil(qs / quantum) * quantum).astype(int))
    assign = levels[np.searchsorted(levels, nlive_arr, side="left")]
    return assign, levels


class CubeFitter:
    """Fit every pixel of a cube stack with the N-component ladder.

    Parameters mirror the reference (main.py:388-421): ``lnZ_thresh``
    (Bayes-factor gate, default 11), ``ncomp_max`` (default 2),
    ``nlive_snr_fact`` (default 5), and the sampler kwargs (default
    nlive=100, tol=1.0, main.py:381-386).

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis; each
    pixel batch is sharded over it (the device-level replacement for
    the reference's ``nproc`` process striping).  ``max_retries``
    re-dispatches a failed batch with a fresh PRNG key before giving
    up on it (its pixels stay absent from the completion manifest, so
    a later ``fit_cube(..., resume=True)`` picks them up).
    """

    # init_factor=4: oversampled-init kill-down (sampler.NSConfig),
    # the root fix for narrow-basin mode loss -- measured on the bench
    # cube: rung-2 nested-floor violations 36 -> 27 per 1024 at ~1%
    # eval cost
    ns_default_kwargs = {"nlive": 100, "tol": 1.0, "init_factor": 4}

    def __init__(self, stack, utrans, runner_cls, runner_kwargs=None,
                 lnZ_thresh=11, ncomp_max=2, ns_kwargs=None,
                 nlive_snr_fact=5, batch_size=1024, n_post=0,
                 nlive_buckets=4, segment_iters=256, mesh=None,
                 max_retries=1, mode_loss_margin=8.0,
                 mode_loss_retries=2, boundary_band=6.0,
                 boundary_nlive_mult=2):
        self.stack = stack
        self.utrans = utrans
        self.runner_cls = runner_cls
        self.runner_kwargs = runner_kwargs or {}
        self.lnZ_thresh = lnZ_thresh
        self.ncomp_max = ncomp_max
        self.ns_kwargs = dict(self.ns_default_kwargs)
        if ns_kwargs:
            self.ns_kwargs.update(ns_kwargs)
        self.nlive_snr_fact = nlive_snr_fact
        self.batch_size = batch_size
        # resolve auto n_post ONCE from the base nlive: SNR buckets run
        # at different nlive, and per-bucket auto resolution would give
        # the store posteriors datasets bucket-dependent widths (the
        # FitTable product aggregation stacks them)
        from nestfit_tpu.sampling.results import resolve_n_post

        self.n_post = resolve_n_post(n_post, self.ns_kwargs["nlive"])
        self.nlive_buckets = nlive_buckets
        self.segment_iters = segment_iters
        self.mesh = mesh
        self.max_retries = max_retries
        # Nested-model evidence floor: model N+1 contains model N (an
        # extra component at negligible amplitude reproduces it), so
        # lnZ can drop from one rung to the next by at most the Occam
        # penalty of the unused component (a few nats here).  A run
        # whose lnZ falls further has provably lost the dominant
        # posterior mode (observed rarely in lockstep batches: every
        # live point drifts into one noise basin early and proposals
        # never escape; measured lnZ deficits of 20 to 2500 nats vs
        # the sequential engine on the same pixel).  Such pixels are
        # re-fit with a fresh key and the consistent run kept.
        self.mode_loss_margin = mode_loss_margin
        self.mode_loss_retries = mode_loss_retries
        # Boundary-band refinement: pixels whose evidence gain lands
        # within ``boundary_band`` nats of ``lnZ_thresh`` get ONE
        # re-fit at ``boundary_nlive_mult * nlive`` and the
        # higher-nlive result SUPERSEDES unconditionally (deterministic
        # replacement, not outcome selection, so no bias).  This is
        # the targeted form of the reference's SNR-scaled nlive boost
        # (main.py:444-447): spend live points exactly where the
        # N-selection decision is delicate -- seed-level lnZ scatter
        # and narrow-basin mode loss both concentrate their nbest
        # flips in this band (validation/selection_sharpness.md).
        # Set boundary_band=0 to disable.
        self.boundary_band = boundary_band
        self.boundary_nlive_mult = boundary_nlive_mult
        self._jit_cache = {}

    # mn_kwargs alias for reference API parity
    @property
    def mn_kwargs(self):
        return self.ns_kwargs

    @property
    def _dp_size(self):
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("dp", 1)

    def _make_runner(self, datas, noises, ncomp):
        """Batched runner over per-pixel data arrays."""
        spectra = []
        for cube, d, n in zip(self.stack.cubes, datas, noises):
            spec = self.runner_cls.model.make_model_spectrum(
                cube.xarr, d, jnp.maximum(n, 1e-30), trans_id=cube.trans_id
            )
            spectra.append(spec)
        return self.runner_cls(
            tuple(spectra), self.utrans, ncomp=ncomp, **self.runner_kwargs
        )

    def fit_cube(self, store_name="run/test_cube", nproc=1, seed=0,
                 timeout=None, resume=False, host_shard=False,
                 process_id=None, process_count=None, link=True):
        """Fit the full field and write the store.

        ``nproc`` is accepted for API parity with the reference
        (main.py:476-527) but parallelism is device-level (``mesh``);
        chunk files are written per batch.  With ``resume=True``,
        pixels already present in the store's completion manifest are
        skipped (the tile-granular restart the reference lacks,
        main.py:514).

        Multi-host: with ``host_shard=True`` each process fits only
        its contiguous share of the valid pixels
        (``host_pixel_shard``) and writes its own
        ``chunk_h<process>_<j>.hdf`` shard files -- the TPU-pod
        analogue of the reference's one-chunk-per-process layout
        (docs/store_spec.rst:12-20; main.py:505-523).  Only process 0
        touches ``table.hdf`` (header/metadata, and -- after a
        cross-host barrier when available -- the external-link step);
        other processes never open it, so no HDF5 lock contention.
        Pass ``link=False`` to defer linking (e.g. to a coordinator
        that runs after all workers exit, as the two-process test
        does).
        """
        n_lon, n_lat = self.stack.spatial_shape
        datas, noises, nan_mask, max_snr = self.stack.get_flat_batch()
        n_pix = datas[0].shape[0]
        valid = ~nan_mask
        valid_ix = np.nonzero(valid)[0]

        if host_shard:
            from nestfit_tpu.parallel.distributed import host_pixel_stripe
            pi = jax.process_index() if process_id is None else process_id
            pc = jax.process_count() if process_count is None \
                else process_count
        else:
            pi, pc = 0, 1
        nchunks = max(1, int(np.ceil(valid_ix.size / self.batch_size)))

        if pi == 0:
            store = HdfStore(store_name, nchunks=nchunks)
            store_dir = store.store_dir
        else:
            store = None
            from nestfit_tpu.cube.store import check_ext
            store_dir = Path(check_ext(str(store_name), ext="store"))
            store_dir.mkdir(parents=True, exist_ok=True)
        if resume:
            from nestfit_tpu.cube.store import completed_pixels
            done = completed_pixels(store_dir)
            valid_ix = np.setdiff1d(valid_ix, done)
            log.info("fit_cube: resume skips %d completed pixels", done.size)
        if host_shard:
            # interleaved stripe, not a contiguous range: spatially
            # clustered signal (slow pixels) spreads evenly over hosts
            shard_ix = valid_ix[host_pixel_stripe(valid_ix.size, pi, pc)]
            log.info("fit_cube: host %d/%d owns %d of %d valid pixels",
                     pi, pc, shard_ix.size, valid_ix.size)
        else:
            shard_ix = valid_ix
        log.info("fit_cube: %d/%d valid pixels", shard_ix.size, n_pix)
        if store is not None:
            store.insert_header(self.stack)
            store.insert_fitter_pars(self)
            store.insert_model_metadata(self.runner_cls.model)

        # SNR-scaled live points, bucketed (main.py:444-447)
        base_nlive = self.ns_kwargs.get("nlive", 100)
        nlive_pix = base_nlive + (
            self.nlive_snr_fact * np.nan_to_num(max_snr[shard_ix])
        ).astype(int)
        if shard_ix.size:
            nlive_assign, _ = bucket_nlive(
                nlive_pix, n_buckets=self.nlive_buckets
            )
        else:
            nlive_assign = np.empty(0, dtype=int)

        if host_shard:
            chunk_path_of = (
                lambda j: store_dir / f"chunk_h{pi}_{j}.hdf"
            )
        else:
            chunk_path_of = (
                lambda j: store.chunk_paths[j % store.nchunks]
            )

        # decorrelate hosts: each host derives its own key stream
        # (single-process runs keep the historical stream)
        key = random.key(seed) if pc == 1 else \
            random.split(random.key(seed), pc)[pi]
        chunk_id = 0
        t_start = time.time()
        for level in np.unique(nlive_assign):
            sel = shard_ix[nlive_assign == level]
            ns_kwargs = dict(self.ns_kwargs)
            ns_kwargs["nlive"] = int(level)
            cfg = NSConfig(**ns_kwargs)
            for lo in range(0, sel.size, self.batch_size):
                batch_ix = sel[lo:lo + self.batch_size]
                key, sub = random.split(key)
                self._run_batch_with_retry(
                    sub, batch_ix, datas, noises, cfg,
                    chunk_path_of(chunk_id), n_lat,
                )
                chunk_id += 1
        log.info("fit_cube: fitting done in %.1fs", time.time() - t_start)

        if host_shard and pc > 1:
            # cross-host barrier before process 0 links, when the
            # runtime provides one (TPU pods); the 2-process CPU test
            # instead links from the parent after workers exit
            try:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("nestfit_fit_cube")
            except Exception:
                log.warning("no cross-host barrier available; "
                            "link chunk shards externally")
                link = False
        if store is not None:
            if link:
                store.link_files()
            store.hdf.flush()
            store.close()
        return store

    def _run_batch_with_retry(self, key, batch_ix, datas, noises, cfg,
                              chunk_path, n_lat):
        """Dispatch one batch, re-keying on failure (tile-granular
        fault tolerance; batches are pure and idempotent)."""
        for attempt in range(self.max_retries + 1):
            try:
                return self._fit_batch_ladder(
                    key, batch_ix, datas, noises, cfg, chunk_path, n_lat,
                )
            except Exception:
                if attempt >= self.max_retries:
                    log.exception(
                        "batch of %d pixels failed after %d attempts; "
                        "left for resume", batch_ix.size, attempt + 1,
                    )
                    return None
                log.exception("batch failed; retrying with a fresh key")
                key = random.split(key)[0]

    def _pad_quantum(self, n):
        """Next power of two, rounded up to a multiple of the mesh's
        ``dp`` size (static shapes -> one compile per size class; even
        shards per device)."""
        p = 1
        while p < n:
            p *= 2
        dp = self._dp_size
        if p % dp:
            p = int(np.ceil(n / dp)) * dp
        return max(p, dp)

    def _shard_batch(self, tree):
        """Place per-pixel arrays on the mesh, pixel axis over ``dp``."""
        if self.mesh is None:
            return tree
        from nestfit_tpu.parallel.mesh import shard_pixel_batch

        return shard_pixel_batch(self.mesh, tree)

    def _get_template_runner(self, ncomp, r_pad, datas, noises):
        """One runner template per (ncomp, batch size): repeated
        batches reuse its compiled sampler (data enters as arguments)."""
        cache_key = (ncomp, r_pad)
        if cache_key not in self._jit_cache:
            self._jit_cache[cache_key] = self._make_runner(
                datas, noises, ncomp
            )
        return self._jit_cache[cache_key]

    def _refit_mode_losses(self, key, fit, lnz, prev, cur_ix, r_pad,
                           ncomp, cfg, datas, noises):
        """Detect and re-fit runs that violate the nested-model
        evidence floor ``lnZ_N >= lnZ_{N-1} - mode_loss_margin``
        (``lnZ_1 >= null_lnZ - margin`` on the first rung).

        A violating run has provably lost the dominant mode -- the
        bound holds for the true evidences by model nesting -- so the
        failed pixels are re-fit as a small padded batch with a fresh
        key, and each pixel keeps whichever run reports the higher
        (i.e. consistent) evidence, whole-row (posteriors and products
        included).  Conditioning the choice on an objective constraint
        violation does not bias lnZ the way unconditional
        max-of-restarts would.

        Retries after the first ESCALATE to
        ``boundary_nlive_mult * nlive`` (same death cap, so per-run
        record rows merge; see ``align_fit_meta``): more live points
        attack mode loss at its root -- the thinning basin keeps
        members through the phase transition -- and the r5 on-device
        measurement retired the old ``fallback_repeats = 2 * ndim``
        escalation, which cost 150 s per 64-row batch (142k evals/px)
        against 23 s for the nlive=2x batch with at least equal
        recovery.
        """
        import dataclasses

        from nestfit_tpu.sampling.fit import align_fit_meta, merge_fit_rows

        n = cur_ix.size
        for attempt in range(self.mode_loss_retries):
            bad = np.flatnonzero(lnz < prev - self.mode_loss_margin)
            if bad.size == 0:
                break
            ndim = self.utrans.n_param * ncomp
            cfg_a = cfg if attempt == 0 else dataclasses.replace(
                cfg, nlive=self.boundary_nlive_mult * cfg.nlive,
                max_iter=cfg.resolved(ndim).max_iter,
            )
            log.warning(
                "mode-loss retry %d: %d/%d runs at ncomp=%d fell > "
                "%.0f nats below the previous rung; re-fitting%s",
                attempt + 1, bad.size, n, ncomp, self.mode_loss_margin,
                " (escalated nlive)" if attempt else "",
            )
            r_r = self._pad_quantum(bad.size)
            pad_ix = np.concatenate([
                cur_ix[bad], np.full(r_r - bad.size, cur_ix[bad][0]),
            ])
            d_r = [jnp.asarray(d[pad_ix], dtype=jnp.float32)
                   for d in datas]
            n_r = [jnp.asarray(np.maximum(nn[pad_ix], 1e-30),
                               dtype=jnp.float32) for nn in noises]
            key, sub = random.split(key)
            template = self._get_template_runner(ncomp, r_r, d_r, n_r)
            data_tree = self._shard_batch(tuple(zip(d_r, n_r)))
            fit_r = fit_batch(
                sub, template, r_r, cfg_a, n_post=self.n_post,
                segment_iters=self.segment_iters, data=data_tree,
                active=np.arange(r_r) < bad.size,
            )
            lnz_r = np.asarray(fit_r.lnz)[: bad.size]
            better = lnz_r > lnz[bad]
            if better.any():
                dst = bad[better]
                src = np.flatnonzero(better)
                fit = merge_fit_rows(fit, align_fit_meta(fit_r, fit),
                                     dst, src, r_pad, r_r)
                lnz = lnz.copy()
                lnz[dst] = lnz_r[better]
        still = np.flatnonzero(lnz < prev - self.mode_loss_margin)
        if still.size:
            log.warning(
                "mode-loss retry: %d runs at ncomp=%d still "
                "inconsistent after %d retries (kept best lnZ)",
                still.size, ncomp, self.mode_loss_retries,
            )
        return fit, lnz

    def _refine_boundary(self, key, fit, lnz, prev, cur_ix, r_pad,
                         ncomp, cfg, datas, noises):
        """Re-fit decision-boundary pixels at a higher live count.

        Pixels with ``|gain - lnZ_thresh| <= boundary_band`` are re-run
        at ``boundary_nlive_mult * nlive`` (same max_iter, so every
        per-run record row merges) and the refined rows replace the
        originals UNCONDITIONALLY -- more live points is strictly
        better resolution, and replacement decided before seeing the
        outcome carries no selection bias.  Mirrors the reference's
        per-pixel nlive boost (main.py:444-447) in targeted form.

        Note: for refined pixels the stored ``nlive`` attr remains the
        batch's base value (NSResult metadata is batch-level); their
        ``n_dead``/``ncall`` reflect the refined run.
        """
        import dataclasses

        from nestfit_tpu.sampling.fit import align_fit_meta, merge_fit_rows

        if self.boundary_band <= 0 or self.boundary_nlive_mult <= 1:
            return fit, lnz
        gain = lnz - prev
        band = np.flatnonzero(
            np.abs(gain - self.lnZ_thresh) <= self.boundary_band
        )
        if band.size == 0:
            return fit, lnz
        ndim = self.utrans.n_param * ncomp
        cfg_b = dataclasses.replace(
            cfg, nlive=self.boundary_nlive_mult * cfg.nlive,
            max_iter=cfg.resolved(ndim).max_iter,
        )
        log.info(
            "boundary refine: %d/%d runs at ncomp=%d within %.0f nats "
            "of the %.0f-nat gate; re-fitting at nlive=%d",
            band.size, cur_ix.size, ncomp, self.boundary_band,
            self.lnZ_thresh, cfg_b.nlive,
        )
        r_b = self._pad_quantum(band.size)
        pad_ix = np.concatenate([
            cur_ix[band], np.full(r_b - band.size, cur_ix[band][0]),
        ])
        d_b = [jnp.asarray(d[pad_ix], dtype=jnp.float32) for d in datas]
        n_b = [jnp.asarray(np.maximum(nn[pad_ix], 1e-30),
                           dtype=jnp.float32) for nn in noises]
        key, sub = random.split(key)
        template = self._get_template_runner(ncomp, r_b, d_b, n_b)
        data_tree = self._shard_batch(tuple(zip(d_b, n_b)))
        fit_b = fit_batch(
            sub, template, r_b, cfg_b, n_post=self.n_post,
            segment_iters=self.segment_iters, data=data_tree,
            active=np.arange(r_b) < band.size,
        )
        lnz_b = np.asarray(fit_b.lnz)[: band.size]
        fit = merge_fit_rows(fit, align_fit_meta(fit_b, fit), band,
                             np.arange(band.size), r_pad, r_b)
        lnz = lnz.copy()
        lnz[band] = lnz_b
        return fit, lnz

    def _fit_batch_ladder(self, key, batch_ix, datas, noises, cfg,
                          chunk_path, n_lat):
        """Run the 1..ncomp_max ladder for one pixel batch and write
        the chunk file (reference inner loop main.py:436-473)."""
        import h5py

        nbest = np.zeros(batch_ix.size, dtype=np.int32)
        pos_of = {pix: i for i, pix in enumerate(batch_ix)}
        cur_ix = batch_ix                   # survivors (global pixel ids)
        fits = {}                           # ncomp -> (fit, global ids)
        old_lnz = None
        for ncomp in range(1, self.ncomp_max + 1):
            if cur_ix.size == 0:
                break
            r_pad = self._pad_quantum(cur_ix.size)
            # pad survivor batch by repeating the first pixel
            pad_ix = np.concatenate([
                cur_ix, np.full(r_pad - cur_ix.size, cur_ix[0]),
            ])
            d_b = [jnp.asarray(d[pad_ix], dtype=jnp.float32) for d in datas]
            n_b = [jnp.asarray(np.maximum(n[pad_ix], 1e-30),
                               dtype=jnp.float32) for n in noises]
            key, sub, k_retry, k_band = random.split(key, 4)
            t0 = time.time()
            template = self._get_template_runner(ncomp, r_pad, d_b, n_b)
            data_tree = self._shard_batch(tuple(zip(d_b, n_b)))
            # padding rows are born done: a live copy of a real pixel
            # would run a full fit and can set the lockstep tail
            act_m = np.arange(r_pad) < cur_ix.size
            fit = fit_batch(
                sub, template, r_pad, cfg, n_post=self.n_post,
                segment_iters=self.segment_iters, data=data_tree,
                active=act_m,
            )
            jax.block_until_ready(fit.lnz)
            log.info(
                "batch ladder: ncomp=%d R=%d (pad %d) nlive=%d took %.1fs",
                ncomp, cur_ix.size, r_pad, cfg.nlive, time.time() - t0,
            )
            lnz = np.asarray(fit.lnz)[: cur_ix.size]
            if ncomp == 1:
                prev = np.asarray(fit.null_lnz)[: cur_ix.size]
            else:
                prev = old_lnz
            fit, lnz = self._refit_mode_losses(
                k_retry, fit, lnz, prev, cur_ix, r_pad, ncomp, cfg,
                datas, noises,
            )
            fit, lnz = self._refine_boundary(
                k_band, fit, lnz, prev, cur_ix, r_pad, ncomp, cfg,
                datas, noises,
            )
            fits[ncomp] = (fit, cur_ix)
            gain = lnz - prev
            passed = gain >= self.lnZ_thresh
            # update nbest for survivors that passed this rung
            for pix in cur_ix[passed]:
                nbest[pos_of[pix]] = ncomp
            # survivors for the next rung
            cur_ix = cur_ix[passed]
            old_lnz = lnz[passed]

        # write chunk: fit groups, pixel-level attrs (incl. nbest), and
        # the completion manifest -- all while the chunk file is open
        with h5py.File(chunk_path, "a") as hdf:
            for ncomp, (fit, ids) in fits.items():
                for run_ix, pix in enumerate(ids):
                    i_lon = int(pix // n_lat)
                    i_lat = int(pix % n_lat)
                    group = write_fit_group(
                        hdf, i_lon, i_lat, ncomp, fit, run_ix
                    )
                    group.parent.attrs["nbest"] = int(nbest[pos_of[pix]])
            HdfStore.mark_completed(hdf, batch_ix)
            hdf.flush()
        return fits
