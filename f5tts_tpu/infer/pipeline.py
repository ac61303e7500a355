"""End-to-end zero-shot inference pipeline.

Rebuild of the reference inference layer (src/f5_tts/infer/utils_infer.py):
- chunk_text (:73-102): sentence split on punctuation, utf-8 byte budget
- speech-rate-scaled chunk budget (:404): max_chars = ref_bytes/ref_secs *
  (22 - ref_secs) * speed
- duration estimate (:486-493): ref_frames + ref_frames/ref_bytes * gen_bytes
  / speed; short text (<10 bytes) forces speed 0.3
- RMS normalize to 0.1 and restore (:463-465, 514-515)
- cross-fade stitching (:553-585), streaming chunk generator (:528-537)

TPU specifics: target durations are padded up to compile buckets (multiples
of `bucket_size` frames) so the jitted sampler compiles once per bucket; the
valid length rides in `duration` and masking handles the tail — the
reference recompiles nothing but pays per-step host dispatch instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, SamplingConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.models import cfm, dit
from f5tts_tpu.ops.mel import MelFrontend
from f5tts_tpu.text.pinyin import convert_char_to_pinyin
from f5tts_tpu.text.vocab import list_str_to_idx, list_str_to_tensor
from f5tts_tpu.utils import duration_bucket, make_time_grid


SENTENCE_SPLIT_RE = re.compile(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])")


def chunk_text(text: str, max_chars: int = 135) -> list[str]:
    """Reference utils_infer.py:73-102: split on sentence punctuation, pack
    to a utf-8 byte budget."""
    chunks: list[str] = []
    current = ""
    sentences = SENTENCE_SPLIT_RE.split(text)
    for sentence in sentences:
        if not sentence:
            continue
        joiner = " " if sentence and len(sentence[-1].encode("utf-8")) == 1 else ""
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += sentence + joiner
        else:
            if current:
                chunks.append(current.strip())
            current = sentence + joiner
    if current:
        chunks.append(current.strip())
    return chunks


def chunk_text_low_ttfb(text: str, first_chunk_chars: tuple = (12, 40, 80),
                        max_chars: int = 135) -> list[str]:
    """Low-TTFB chunking: leading chunks use small, GROWING byte budgets so
    the first audio leaves the device quickly, later chunks the normal budget
    (reference socket_server.py:139-143). Packs the sentence list directly
    (same split rules as chunk_text) — a prefix-length cursor desyncs on
    collapsed whitespace."""
    sentences = [s for s in SENTENCE_SPLIT_RE.split(text) if s]
    budgets = iter(first_chunk_chars)
    chunks: list[str] = []
    cur, cur_budget = "", next(budgets, max_chars)
    for s in sentences:
        joiner = " " if len(s[-1].encode("utf-8")) == 1 else ""
        if cur and len(cur.encode("utf-8")) + len(s.encode("utf-8")) > cur_budget:
            chunks.append(cur.strip())
            cur, cur_budget = "", next(budgets, max_chars)
        cur += s + joiner
    if cur.strip():
        chunks.append(cur.strip())
    return [c for c in chunks if c]


def max_chars_for_ref(ref_text: str, ref_audio_secs: float, speed: float = 1.0) -> int:
    """Reference utils_infer.py:404."""
    return int(
        len(ref_text.encode("utf-8")) / max(ref_audio_secs, 1e-6)
        * (22 - ref_audio_secs) * speed
    )


def estimate_duration_frames(
    ref_frames: int, ref_text: str, gen_text: str, speed: float = 1.0,
    fix_duration_secs: Optional[float] = None,
    sample_rate: int = 24000, hop: int = 256,
) -> int:
    """Reference utils_infer.py:486-493."""
    if fix_duration_secs is not None:
        return int(fix_duration_secs * sample_rate / hop)
    if len(gen_text.encode("utf-8")) < 10:
        speed = 0.3
    ref_bytes = max(len(ref_text.encode("utf-8")), 1)
    gen_bytes = len(gen_text.encode("utf-8"))
    return ref_frames + int(ref_frames / ref_bytes * gen_bytes / speed)


def cross_fade(waves: list[np.ndarray], sr: int, duration: float = 0.15) -> np.ndarray:
    """Reference utils_infer.py:553-585."""
    if not waves:
        return np.zeros(0, np.float32)
    if duration <= 0:
        return np.concatenate(waves)
    out = waves[0]
    for nxt in waves[1:]:
        n = int(duration * sr)
        n = min(n, len(out), len(nxt))
        if n <= 0:
            out = np.concatenate([out, nxt])
            continue
        fade_out = np.linspace(1.0, 0.0, n, dtype=np.float32)
        fade_in = np.linspace(0.0, 1.0, n, dtype=np.float32)
        overlap = out[-n:] * fade_out + nxt[:n] * fade_in
        out = np.concatenate([out[:-n], overlap, nxt[n:]])
    return out


@dataclass
class InferencePipeline:
    """Zero-shot voice cloning: (ref wav, ref text, gen text) -> waveform.

    Holds the DiT params + statics, the vocoder, the mel front end, and the
    tokenizer; drives the jitted CFM sampler with compile-bucketed shapes.
    """

    params: dict
    statics: object                    # backbone statics (DiTStatics/UNetTStatics/...)
    vocoder: object                    # callable mel [b, d, t] -> wav [b, n]
    vocab_char_map: Optional[dict] = None
    mel_cfg: MelConfig = field(default_factory=MelConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    tokenizer: str = "pinyin"          # "pinyin" | "char" | "byte"
    dtype: object = jnp.bfloat16
    backend: str = "pallas"
    bucket_size: int = 256
    quantization: str = "none"         # "none" | "int8" (W8A8 DiT projections)
    backbone: object = None            # cfm.BackboneDef; None -> DiT
    fine_autowarm: bool = False        # background-compile cold fine buckets

    def __post_init__(self):
        if self.backbone is None:
            self.backbone = cfm.DIT
        self.mel = MelFrontend(self.mel_cfg)
        self.hop = self.mel_cfg.hop_length
        self.sr = self.mel_cfg.target_sample_rate
        # inference-only weight copy in the compute dtype: halves HBM weight
        # traffic per ODE step (~20% step-time win at bf16 on v5e)
        if self.dtype != jnp.float32:
            from f5tts_tpu.models.modules import tree_cast

            self.params = tree_cast(self.params, self.dtype)
        from f5tts_tpu.models.modules import fuse_backbone_qkv

        self.params = fuse_backbone_qkv(self.params)
        if self.quantization == "int8":
            from f5tts_tpu.ops.quant import quantize_dit_params

            self.params = quantize_dit_params(self.params)
        elif self.quantization != "none":
            raise ValueError(f"unknown quantization {self.quantization!r}")

        # sampler + vocoder fused under ONE jit: a single host dispatch per
        # generation (the per-dispatch tunnel latency is ~2-3 ms; the
        # reference pays a host round-trip per ODE step)
        def _fused(params, cond, text, lens, duration, t_grid, key, cfg_strength):
            mel = cfm.cfm_sample(
                params, self.statics, cond, text, lens, duration, t_grid,
                key=key, cfg_strength=cfg_strength,
                dtype=self.dtype, backend=self.backend,
                noise_max_len=self.sampling.max_duration,  # bucket-invariant noise
                backbone=self.backbone,
            )
            wav = self.vocoder(jnp.transpose(mel, (0, 2, 1)))
            return mel, wav

        self._fused_generate = jax.jit(_fused)

        # serving hot path: EVERYTHING in one dispatch, int16 at the wire.
        # The dev-tunnel transfer bandwidth dominates serving latency
        # (~40 ms for a f32 ref-mel round trip alone); fusing wav->mel->
        # cond->sampler->vocoder keeps all f32 intermediates on device and
        # moves ~0.8 MB/request instead of ~2.5 MB across three dispatches.
        import functools as _ft

        def _serve(params, wav_i16, up_scale, down_scale, ref_lens, text,
                   totals, t_grid, cfg_strength, key, *, n_bucket):
            wav = wav_i16.astype(jnp.float32) / 32767.0 * up_scale[:, None]
            mel = self.mel.frames_to_mel_bnd(wav)          # [b, wf, n_mels]
            b, wf, nm = mel.shape
            if wf < n_bucket:
                mel = jnp.pad(mel, ((0, 0), (0, n_bucket - wf), (0, 0)))
            else:
                mel = mel[:, :n_bucket]
            row = jnp.arange(n_bucket)[None, :]
            cond = jnp.where((row < ref_lens[:, None])[:, :, None], mel, 0.0)
            out = cfm.cfm_sample(
                params, self.statics, cond, text, ref_lens, totals, t_grid,
                key=key, cfg_strength=cfg_strength,
                dtype=self.dtype, backend=self.backend,
                noise_max_len=self.sampling.max_duration,
                backbone=self.backbone,
            )
            waves = self.vocoder(jnp.transpose(out, (0, 2, 1)))
            waves = waves * down_scale[:, None]
            return jnp.clip(waves * 32767.0, -32767, 32767).astype(jnp.int16)

        self._fused_serve = jax.jit(_ft.partial(_serve),
                                    static_argnames=("n_bucket",))
        # compile-shape tracking for serving observability: every distinct
        # (batch, wav_bucket, text_bucket, n_bucket) combo is one XLA
        # executable; a key first seen mid-serve means a remote compile
        # landed inside a request (BatcherStats surfaces these)
        self.seen_serve_shapes: set = set()
        self._fine_warms_inflight: set = set()
        # shapes whose dispatch AND finalize have completed at least once —
        # i.e. the executable is genuinely warm. seen_serve_shapes marks
        # dispatch time (before a minutes-long remote compile resolves), so
        # the low-TTFB fine gate must key on THIS set, not that one: gating
        # on dispatch-time shapes let a live stream ride a still-compiling
        # fine executable and stall mid-stream.
        self._finalized_serve_shapes: set = set()

    # -- host-side text prep ------------------------------------------------

    def ref_mel(self, wav: np.ndarray) -> np.ndarray:
        """ref wav -> mel [t, n_mels], with the wav padded to a 128-frame
        bucket first: every distinct ref-audio length is otherwise a new jit
        shape for the mel front end (one remote compile per caller-supplied
        clip length in a serving sweep). Frames past the true clip length
        are sliced off (the last 1-2 kept frames see zero-pad instead of the
        clip-edge reflect pad — inaudible prompt-tail difference)."""
        # frame count of the UNPADDED clip (vocos stft is center=True:
        # len//hop + 1; bigvgan uses (n_fft-hop)/2 symmetric pad: len//hop)
        true_frames = len(wav) // self.hop
        if self.mel_cfg.mel_spec_type == "vocos":
            true_frames += 1
        bucket_samples = max(
            ((len(wav) + 128 * self.hop - 1) // (128 * self.hop)) * 128 * self.hop,
            128 * self.hop)
        if bucket_samples > len(wav):
            wav = np.pad(wav, (0, bucket_samples - len(wav)))
        mel = np.asarray(self.mel.frames_to_mel_bnd(jnp.asarray(wav[None])))[0]
        return mel[:true_frames]

    def tokenize(self, texts: list[str]) -> np.ndarray:
        if self.tokenizer == "pinyin":
            token_lists = convert_char_to_pinyin(texts)
            ids = list_str_to_idx(token_lists, self.vocab_char_map)
        elif self.tokenizer == "char":
            ids = list_str_to_idx(texts, self.vocab_char_map)
        else:
            ids = list_str_to_tensor(texts)
        # pad the token axis to a compile bucket: without this every distinct
        # text length is a NEW jit shape — a serving sweep of distinct texts
        # triggers a remote compile per request (minutes each on a cold pod)
        nt = int(np.asarray(ids).shape[1])
        nt_bucket = max(((nt + 63) // 64) * 64, 64)
        if nt_bucket > nt:
            ids = np.pad(np.asarray(ids), ((0, 0), (0, nt_bucket - nt)),
                         constant_values=-1)
        return ids

    # -- core single-chunk generation --------------------------------------

    def generate_chunk(
        self,
        ref_wav: np.ndarray,         # [n] float32, already at target sr
        ref_text: str,
        gen_text: str,
        seed: int = 0,
        speed: Optional[float] = None,
        fix_duration: Optional[float] = None,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway_sampling_coef: Optional[float] = "default",
        target_rms: Optional[float] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (wave [n], gen mel [d, t]). One text chunk."""
        s = self.sampling
        rms_target = s.target_rms if target_rms is None else target_rms
        speed = s.speed if speed is None else speed
        nfe = s.nfe_steps if nfe_step is None else nfe_step
        cfg_strength = s.cfg_strength if cfg_strength is None else cfg_strength
        sway = s.sway_sampling_coef if sway_sampling_coef == "default" else sway_sampling_coef

        # rms normalize (restored after vocoding)
        ref_rms = audio_io.rms(ref_wav)
        if ref_rms < rms_target and ref_rms > 0:
            ref_wav = ref_wav * (rms_target / ref_rms)

        ref_mel = self.ref_mel(ref_wav)
        ref_frames = ref_mel.shape[0]

        total_frames = estimate_duration_frames(
            ref_frames, ref_text, gen_text, speed, fix_duration,
            self.sr, self.hop,
        )
        text_ids = self.tokenize([ref_text + gen_text])
        # true token count, not the padded bucket width (reference cfm.py:135
        # derives text_lens from non-pad tokens) — the bucket width would
        # inflate the enforced minimum duration for short texts
        text_lens = (text_ids != -1).sum(axis=1)
        total_frames = int(cfm.compute_duration(
            jnp.asarray(text_lens), jnp.asarray([ref_frames]),
            jnp.asarray([total_frames]), s.max_duration,
        )[0])

        n_bucket = duration_bucket(total_frames, self.bucket_size, s.max_duration,
                                   self.backbone.seq_extra_tokens)
        cond = np.zeros((1, n_bucket, self.mel_cfg.n_mel_channels), np.float32)
        cond[0, :ref_frames] = ref_mel

        t_grid = make_time_grid(nfe, sway_sampling_coef=sway, use_epss=s.use_epss)

        mel_out, wave_full = self._fused_generate(
            self.params,
            jnp.asarray(cond), jnp.asarray(text_ids),
            jnp.asarray([ref_frames], jnp.int32),
            jnp.asarray([total_frames], jnp.int32),
            t_grid,
            jax.random.PRNGKey(seed),
            jnp.float32(cfg_strength),
        )
        gen_mel_bdt = jnp.transpose(mel_out[:, ref_frames:total_frames, :], (0, 2, 1))
        wave_full = np.asarray(wave_full)
        lo = ref_frames * self.hop
        hi = min(total_frames * self.hop, wave_full.shape[1])
        wave = wave_full[0, lo:hi]

        if ref_rms < rms_target and ref_rms > 0:
            wave = wave * (ref_rms / rms_target)
        return wave.astype(np.float32), np.asarray(gen_mel_bdt)[0]

    def generate_batch(
        self,
        requests: list[dict],
        seed: int = 0,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway_sampling_coef="default",
        bucket_size: Optional[int] = None,
    ) -> list[np.ndarray]:
        """Batched multi-request generation: dispatch + blocking fetch."""
        return self.finalize_batch(self.generate_batch_async(
            requests, seed, nfe_step, cfg_strength, sway_sampling_coef,
            bucket_size=bucket_size))

    def generate_batch_async(
        self,
        requests: list[dict],
        seed: int = 0,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway_sampling_coef="default",
        bucket_size: Optional[int] = None,  # override (warmup fine sweep)
    ):
        """Batched multi-request generation (the serving hot path).

        requests: [{"ref_wav": [n] @ target sr, "ref_text": str, "gen_text":
        str, ...optional speed/fix_duration}]. All requests are padded to one
        compile bucket and run through a single `cfm_sample` + batched
        vocoder call — the TPU-side equivalent of Triton dynamic batching
        (reference model_repo_f5_tts config.pbtxt max_batch_size/dynamic_batching).
        """
        s = self.sampling
        nfe = s.nfe_steps if nfe_step is None else nfe_step
        cfg_v = s.cfg_strength if cfg_strength is None else cfg_strength
        sway = s.sway_sampling_coef if sway_sampling_coef == "default" else sway_sampling_coef

        # batch-size bucketing: every distinct batch size is its own XLA
        # executable (a 5-min remote compile mid-serve). Pad the request
        # list to the next power of two by duplicating the last request —
        # warmup only needs to cover {1, 2, 4, ...}; padded rows are
        # dropped in finalize_batch.
        n_real = len(requests)
        b = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        requests = list(requests) + [requests[-1]] * (b - n_real)
        ref_lens, totals, texts = [], [], []
        up_scale = np.ones((b,), np.float32)
        down_scale = np.ones((b,), np.float32)
        wav_lens = []
        for i, r in enumerate(requests):
            wav = r["ref_wav"]
            rms_v = audio_io.rms(wav)
            if 0 < rms_v < s.target_rms:
                up_scale[i] = s.target_rms / rms_v
                down_scale[i] = rms_v / s.target_rms
            wav_lens.append(len(wav))
            # frame count the unpadded clip would produce (vocos center=True
            # stft: len//hop + 1; bigvgan: len//hop)
            t = len(wav) // self.hop
            if self.mel_cfg.mel_spec_type == "vocos":
                t += 1
            ref_lens.append(t)
            totals.append(estimate_duration_frames(
                t, r["ref_text"], r["gen_text"],
                r.get("speed") or s.speed, r.get("fix_duration"),
                self.sr, self.hop))
            texts.append(r["ref_text"] + r["gen_text"])

        # one int16 wav panel, padded to a shared 128-frame bucket
        wav_bucket = max(((max(wav_lens) + 128 * self.hop - 1)
                          // (128 * self.hop)) * 128 * self.hop, 128 * self.hop)
        wav_i16 = np.zeros((b, wav_bucket), np.int16)
        for i, r in enumerate(requests):
            w = np.clip(r["ref_wav"], -1.0, 1.0)
            wav_i16[i, :wav_lens[i]] = (w * 32767.0).astype(np.int16)

        text_ids = self.tokenize(texts)
        # true per-request token counts, not the shared padded width (see
        # infer(): the bucket width would force short requests to the long
        # request's minimum duration, appending seconds of unconditioned tail)
        text_lens = (text_ids != -1).sum(axis=1)
        totals = np.asarray(cfm.compute_duration(
            jnp.asarray(text_lens), jnp.asarray(ref_lens),
            jnp.asarray(totals), s.max_duration))
        bs = bucket_size or self.bucket_size
        n_bucket = duration_bucket(int(totals.max()), bs,
                                   s.max_duration, self.backbone.seq_extra_tokens)
        text_width = int(np.asarray(text_ids).shape[1])

        # low-TTFB fine bucket: a stream's FIRST chunk ("fine_bucket" on
        # every request in the batch) may ride a half-granularity bucket —
        # up to bucket_size/2 fewer padded sampler rows (~15% less compute
        # at a 768-frame first chunk). Engages ONLY if that exact shape is
        # already warm: a cold fine bucket would put a minutes-long remote
        # compile inside a live stream, the one thing serving must not do.
        # With fine_autowarm, a cold miss warms the fine shape in a
        # background thread (one redundant generation; the persistent
        # compile cache makes restarts instant), so later first chunks with
        # the same ref/text shape get the fine TTFB.
        if (bucket_size is None
                and all(r.get("fine_bucket") for r in requests[:n_real])):
            n_fine = duration_bucket(int(totals.max()), max(bs // 2, 128),
                                     s.max_duration,
                                     self.backbone.seq_extra_tokens)
            fine_key = (b, wav_bucket, text_width, int(n_fine))
            if n_fine < n_bucket:
                if fine_key in self._finalized_serve_shapes:
                    n_bucket = n_fine
                elif (self.fine_autowarm
                      and fine_key not in self._fine_warms_inflight):
                    self._fine_warms_inflight.add(fine_key)
                    warm_reqs = [dict(r) for r in requests[:n_real]]

                    def _warm(reqs=warm_reqs, fbs=max(bs // 2, 128)):
                        # generate_batch = dispatch + finalize: on success the
                        # fine shape lands in _finalized_serve_shapes (via
                        # finalize_batch), which is what opens the gate above.
                        # The inflight marker is cleared in finally so a failed
                        # warm (dispatch OR finalize) can be retried.
                        try:
                            self.generate_batch(reqs, bucket_size=fbs)
                        except Exception:
                            pass
                        finally:
                            self._fine_warms_inflight.discard(fine_key)

                    import threading as _th

                    _th.Thread(target=_warm, daemon=True).start()

        shape_key = (b, wav_bucket, text_width, int(n_bucket))
        shape_is_cold = shape_key not in self.seen_serve_shapes
        self.seen_serve_shapes.add(shape_key)

        t_grid = make_time_grid(nfe, sway_sampling_coef=sway, use_epss=s.use_epss)
        handle = self._fused_serve(
            self.params, jnp.asarray(wav_i16), jnp.asarray(up_scale),
            jnp.asarray(down_scale), jnp.asarray(ref_lens, jnp.int32),
            jnp.asarray(text_ids),
            jnp.asarray(np.minimum(totals, n_bucket), jnp.int32), t_grid,
            jnp.float32(cfg_v), jax.random.PRNGKey(seed), n_bucket=n_bucket)
        return handle, (ref_lens[:n_real], totals[:n_real], n_bucket,
                        shape_is_cold, shape_key)

    def finalize_batch(self, pending) -> list[np.ndarray]:
        """Fetch + slice the result of a generate_batch_async dispatch.
        Rows past the meta length are batch-size-bucket padding (dropped)."""
        handle, meta = pending
        ref_lens, totals, n_bucket = meta[:3]
        waves_all = np.asarray(handle)
        if len(meta) > 4:  # executable proven warm end-to-end (fine-bucket gate)
            self._finalized_serve_shapes.add(meta[4])
        results = []
        for i in range(len(ref_lens)):
            lo = ref_lens[i] * self.hop
            hi = min(int(totals[i]), n_bucket) * self.hop
            hi = min(hi, waves_all.shape[1])
            results.append(waves_all[i, lo:hi].astype(np.float32) / 32767.0)
        return results

    # -- multi-chunk --------------------------------------------------------

    def infer(
        self,
        ref_wav: np.ndarray,
        ref_sr: int,
        ref_text: str,
        gen_text: str,
        seed: int = 0,
        speed: Optional[float] = None,
        fix_duration: Optional[float] = None,
        nfe_step: Optional[int] = None,
        cfg_strength: Optional[float] = None,
        sway_sampling_coef: Optional[float] = "default",
        cross_fade_duration: Optional[float] = None,
        target_rms: Optional[float] = None,
    ) -> tuple[np.ndarray, int, np.ndarray]:
        """Full pipeline: chunk text, generate, cross-fade.
        Returns (wave, sample_rate, mel [d, t])."""
        s = self.sampling
        xf = s.cross_fade_duration if cross_fade_duration is None else cross_fade_duration
        speed_v = s.speed if speed is None else speed

        ref_wav = audio_io.resample(ref_wav, ref_sr, self.sr)
        if not ref_text.endswith(". ") and not ref_text.endswith("。"):
            ref_text = ref_text + " " if ref_text.endswith(".") else ref_text + ". "
        if len(ref_text[-1].encode("utf-8")) == 1:
            ref_text = ref_text + " " if not ref_text.endswith(" ") else ref_text

        ref_secs = len(ref_wav) / self.sr
        chunks = chunk_text(gen_text, max_chars=max(max_chars_for_ref(ref_text, ref_secs, speed_v), 16))
        if not chunks:
            return np.zeros(0, np.float32), self.sr, np.zeros((self.mel_cfg.n_mel_channels, 0))

        waves, mels = [], []
        for chunk in chunks:
            w, mspec = self.generate_chunk(
                ref_wav, ref_text, chunk, seed=seed, speed=speed,
                fix_duration=fix_duration, nfe_step=nfe_step,
                cfg_strength=cfg_strength, sway_sampling_coef=sway_sampling_coef,
                target_rms=target_rms,
            )
            waves.append(w)
            mels.append(mspec)

        final = cross_fade(waves, self.sr, xf)
        return final, self.sr, np.concatenate(mels, axis=1)

    def infer_stream(
        self,
        ref_wav: np.ndarray,
        ref_sr: int,
        ref_text: str,
        gen_text_chunks: list[str],
        chunk_size: int = 2048,
        **kw,
    ) -> Generator[tuple[np.ndarray, int], None, None]:
        """Streaming mode (reference utils_infer.py:528-537): yields fixed-size
        waveform chunks per generated text chunk."""
        ref_wav = audio_io.resample(ref_wav, ref_sr, self.sr)
        for gen_text in gen_text_chunks:
            wave, _ = self.generate_chunk(ref_wav, ref_text, gen_text, **kw)
            for j in range(0, len(wave), chunk_size):
                yield wave[j : j + chunk_size], self.sr
