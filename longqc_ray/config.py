"""Filter configuration — the analogue of LongQC's CLI presets.

The reference bundles thresholds into presets (pb-rs2/pb-sequel/ont-*,
longQC.py:171-233) and a warn/error rule cascade (longQC.py:784-824).
Here the same role is played by one frozen dataclass consumed by both
the Ray engine and the pure-Python oracle — the thresholds ARE the
spec, so they live in exactly one place.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Codecs the decode stage understands (analogue of guess_format's
# accepted container set, lq_utils.py:89-134). "wav"/"au"/"aiff" are
# binary CONTAINERS (kernels/containers.py — the BAM/fast5 reader
# analogue, lq_utils.py:211-261): a row with a container codec must
# also carry a parseable header (else bad_codec) whose declared sample
# rate matches the sr_hz column (else bad_sr).
KNOWN_CODECS = ("pcm_s16le", "mulaw", "wav", "au", "aiff")
CONTAINER_CODECS = ("wav", "au", "aiff")

# Sample rates considered sane for speech clips.
ALLOWED_SR_HZ = (8000, 16000, 22050, 44100)


@dataclass(frozen=True)
class FilterConfig:
    """Thresholds for the keep/drop rule cascade (M15 analogue).

    keep = dur_ok ∧ sr_ok ∧ codec_ok ∧ consistent ∧ snr_ok ∧ rep_ok
           ∧ lang_ok ∧ ppl_ok ∧ ¬toxic ∧ transcript_ok
    """

    # --- duration / sanity rules (analogue of the 500 bp short-read
    # threshold longQC.py:107-112 and format sanity checks) ---
    min_dur_ms: int = 300
    max_dur_ms: int = 30_000
    # |dur_from_bytes - dur_ms| tolerance: max(abs_ms, rel * dur_ms)
    dur_tol_ms: int = 50
    dur_tol_rel: float = 0.10

    # --- audio quality (analogue of meanQ / Q7, lqutils.c:26-80) ---
    snr_min_db: float = 5.0
    # per-clip work cap: analyze at most this many samples
    # (deterministic analogue of the COVT=150 coverage cap with
    # random thinning, esterr.c:85-100 / minimap2-coverage.h:20).
    # 8192 keeps the FFT a fixed power-of-2 for clips ≥ ~0.4-1 s;
    # fixture synthesis aligns planted sinusoids to this window, so
    # generator/estimator/oracle move together.
    snr_max_samples: int = 8_192
    snr_top_bins: int = 8          # spectral peaks counted as "signal"
    frame_len: int = 1024          # frames for the active-frame fraction
    frame_rms_floor: float = 0.01  # frame considered active above this RMS
    min_active_frame_frac: float = 0.5

    # --- transcript repetition / low-complexity
    # (analogue of SDUST masking sdust.c:136-177 and the
    # highly-masked exclusion rule longQC.py:370-372) ---
    rep_k: int = 3
    rep_window: int = 64
    rep_score_threshold: float = 1.5
    # drop if masked_frac > hard OR (n_chars > long_len ∧ masked_frac > soft)
    rep_hard_frac: float = 0.40
    rep_soft_frac: float = 0.25
    rep_long_len: int = 600

    # --- language id ---
    target_lang: str = "en"
    lang_min_conf: float = 0.60

    # --- perplexity (analogue of non-sense-read thresholds,
    # longQC.py:141-143) ---
    ppl_max: float = 40.0

    # --- transcript sanity ---
    min_transcript_chars: int = 8

    # --- scrub / toxicity are parameterized by the pattern / lexicon
    # modules; the rule here is only "0 toxic hits" ---
    max_toxic_hits: int = 0

    # --- reservoir sample size for model calibration
    # (analogue of -n/--n_sample 5000, longQC.py:905-907) ---
    n_sample: int = 5000
    sample_seed: int = 7  # the reference's per-chunk seed, lq_utils.py:386


DEFAULT_CONFIG = FilterConfig()

# Named presets — the analogue of the reference's -x preset bundles
# (pb-rs2/pb-sequel/pb-hifi/ont-*, longQC.py:171-233): one knob picks
# a coherent threshold set; individual flags can still override.
PRESETS: "dict[str, FilterConfig | CohortConfig]" = {
    "default": DEFAULT_CONFIG,
    # stricter gates for high-quality training corpora (the pb-hifi
    # analogue: tighter thresholds on an already-clean channel)
    "strict": FilterConfig(
        snr_min_db=10.0,
        lang_min_conf=0.80,
        ppl_max=30.0,
        rep_hard_frac=0.30,
        rep_soft_frac=0.20,
        min_active_frame_frac=0.6,
    ),
    # permissive pass for exploratory sweeps (ont-rapid analogue:
    # noisy channel, keep more, let downstream stages re-filter)
    "lenient": FilterConfig(
        snr_min_db=2.0,
        lang_min_conf=0.40,
        ppl_max=80.0,
        rep_hard_frac=0.50,
        rep_soft_frac=0.35,
        min_dur_ms=150,
    ),
}


@dataclass(frozen=True)
class CohortConfig:
    """Dual-threshold cohort mode — the analogue of the reference's
    ``--short`` run (longQC.py:107-112: split at 500 bp; :409-415:
    each cohort goes through its own coverage/threshold params, then
    the outputs merge). Rows with dur_ms < split_dur_ms are judged by
    ``short``, the rest by ``normal``; the rule stage evaluates both
    cascades vectorized over the whole batch and selects per row, so
    cohort mode costs one extra vectorized pass — never a second
    pipeline execution or an extra shuffle."""

    split_dur_ms: int = 1000
    short: FilterConfig = field(default_factory=lambda: PRESETS["lenient"])
    normal: FilterConfig = field(default_factory=lambda: DEFAULT_CONFIG)


# dual-threshold cohort preset (the reference's --short run): lenient
# rules under 1 s, default rules above — selectable from the CLI like
# any single-config preset (label_clips/filter_clips accept both types)
PRESETS["cohort"] = CohortConfig()


def extraction_config(cfg: "FilterConfig | CohortConfig") -> FilterConfig:
    """Feature-EXTRACTION view of a config. For CohortConfig this is
    the normal cohort's extraction params with the permissive UNION of
    both cohorts' duration sanity bounds, so the feature stage computes
    stats for every row either cohort might keep (the rule stage then
    applies each cohort's own bounds)."""
    if isinstance(cfg, CohortConfig):
        from dataclasses import replace

        return replace(
            cfg.normal,
            min_dur_ms=min(cfg.short.min_dur_ms, cfg.normal.min_dur_ms),
            max_dur_ms=max(cfg.short.max_dur_ms, cfg.normal.max_dur_ms),
        )
    return cfg


# Drop-reason labels in evaluation priority order; the first failing
# rule names the row's drop_reason (the lineage manifest histograms
# these per partition).
DROP_REASONS = (
    "bad_codec",
    "bad_sr",
    "too_short",
    "too_long",
    "dur_mismatch",
    "low_snr",
    "short_transcript",
    "repetitive",
    "wrong_lang",
    "high_ppl",
    "toxic",
)
