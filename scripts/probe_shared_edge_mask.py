"""Probe: can edge-masking make shared-backbone numerics per-window?

The shared-backbone path (+12.5% at the headline scale) deviates from
the reference at window edges: a window's features sliced from a span
see REAL temporal context through conv receptive fields, while the
reference's per-window forward sees SAME zero padding (PARITY.md).
VERDICT r3 weak #6 asks whether zero-masking the span features at each
window's receptive-field edge restores per-window numerics (which would
make the 472 clips/s path the default headline).

This measures, on CPU with the tiny test geometry (clip 128, crop 32):
  1. the per-step feature agreement profile between a window's span
     slice and its per-window forward — which temporal steps differ and
     by how much (the interior is expected bit-equal,
     tests/test_shared_backbone.py);
  2. decode-output deltas for (a) raw shared slices and (b) shared
     slices with the edge-affected steps zeroed IN BOTH paths;
  3. the arithmetic that decides the question: with a ~111-frame
     receptive field, the edge-affected margin is ~55 frames per side =
     ~14 of 32 Mixed_4f steps per 128-frame window (~28 of 64 at the
     shipped 256) — per-window edge features are conv outputs of the
     zero-padded input, NOT zeros, so masking replaces one deviation
     with a larger one.

Run: PYTHONPATH=. python scripts/probe_shared_edge_mask.py
"""

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from opental_tpu.models.bdnet import BDNet  # noqa: E402

CLIP, CROP, STRIDE = 128, 32, 64
RF = 111                    # backbone temporal receptive field (frames)


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP)
    x0 = jnp.zeros((1, CLIP, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    t = STRIDE + CLIP                 # one k=2 span, no tail margin
    video = rng.rand(t, CROP, CROP, 3).astype(np.float32) * 2 - 1

    feats = jax.jit(lambda v, x: model.apply(
        v, x, method=BDNet.backbone_features))
    detect = jax.jit(lambda v, f: model.apply(
        v, f, method=BDNet.detect_from_features))

    # span features once; slice both windows
    span_f = feats(variables, jnp.asarray(video)[None])
    offs = [0, STRIDE]
    w4, w8 = CLIP // 4, CLIP // 8
    slice4 = jnp.concatenate([span_f['Mixed_4f'][:, o // 4:o // 4 + w4]
                              for o in offs])
    slice8 = jnp.concatenate([span_f['Mixed_5c'][:, o // 8:o // 8 + w8]
                              for o in offs])

    # per-window forwards (zero-padded semantics = plain window input)
    wins = np.stack([video[o:o + CLIP] for o in offs])
    win_f = feats(variables, jnp.asarray(wins))

    # 1. feature agreement profile per temporal step
    for key, sl, stride in (('Mixed_4f', slice4, 4),
                            ('Mixed_5c', slice8, 8)):
        pw = win_f[key]
        d = np.abs(np.asarray(sl, np.float32)
                   - np.asarray(pw, np.float32))
        step_max = d.reshape(d.shape[0], d.shape[1], -1).max(-1)
        margin = (RF // 2) // stride + 1
        steps = d.shape[1]
        interior = step_max[:, margin:steps - margin]
        print(f'{key}: steps={steps} margin~{margin} '
              f'edge max|d|={step_max[:, :margin].max():.4f} '
              f'interior max|d|={interior.max():.2e} '
              f'differing steps/window='
              f'{(step_max > 1e-6).sum(1).mean():.1f}/{steps}')

    # 2. decode deltas: raw shared vs per-window, and edge-masked both
    def decode_all(f4, f8):
        out = detect(variables, {'Mixed_4f': f4, 'Mixed_5c': f8})
        return np.asarray(out['conf'], np.float32), \
            np.asarray(out['loc'], np.float32)

    conf_pw, loc_pw = decode_all(win_f['Mixed_4f'], win_f['Mixed_5c'])
    conf_sh, loc_sh = decode_all(slice4, slice8)

    def mask_edges(f, stride):
        margin = (RF // 2) // stride + 1
        steps = f.shape[1]
        m = jnp.zeros((steps,), bool).at[margin:steps - margin].set(True)
        return jnp.where(m[None, :, None, None, None]
                         if f.ndim == 5 else m[None, :, None], f, 0.0)

    conf_m_pw, loc_m_pw = decode_all(mask_edges(win_f['Mixed_4f'], 4),
                                     mask_edges(win_f['Mixed_5c'], 8))
    conf_m_sh, loc_m_sh = decode_all(mask_edges(slice4, 4),
                                     mask_edges(slice8, 8))

    def rel(a, b):
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))

    print(f'decode conf: shared-vs-perwin rel max|d| '
          f'{rel(conf_sh, conf_pw):.4f}; '
          f'edge-masked-both rel max|d| {rel(conf_m_sh, conf_m_pw):.2e}')
    print(f'decode loc:  shared-vs-perwin rel max|d| '
          f'{rel(loc_sh, loc_pw):.4f}; '
          f'edge-masked-both rel max|d| {rel(loc_m_sh, loc_m_pw):.2e}')
    print(f'masked-vs-unmasked per-window conf rel max|d| '
          f'{rel(conf_m_pw, conf_pw):.4f}  <- the cost of masking '
          f'(masking is NOT per-window numerics)')


if __name__ == '__main__':
    main()
