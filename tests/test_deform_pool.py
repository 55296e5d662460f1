"""Deformable PSRoI pooling vs numpy brute-force (CUDA kernel semantics)."""
import numpy as np
import jax.numpy as jnp

from mqdet_tpu.ops.deform_pool import deform_psroi_pool


def brute(features, rois, trans, spatial_scale, output_dim, ps, gs, part,
          spp, trans_std, no_trans):
    b, h, w, c = features.shape
    n = len(rois)
    ncls = 1 if no_trans else trans.shape[1]
    ch_each = output_dim // ncls
    out = np.zeros((n, ps, ps, output_dim), np.float32)

    def interp(plane, x, y):
        x1, x2 = int(np.floor(x)), int(np.ceil(x))
        y1, y2 = int(np.floor(y)), int(np.ceil(y))
        dx, dy = x - x1, y - y1
        return ((1 - dx) * (1 - dy) * plane[y1, x1] + (1 - dx) * dy * plane[y2, x1]
                + dx * (1 - dy) * plane[y1, x2] + dx * dy * plane[y2, x2])

    for ni in range(n):
        bi = int(rois[ni, 0])
        x1 = round(rois[ni, 1]) * spatial_scale - 0.5
        y1 = round(rois[ni, 2]) * spatial_scale - 0.5
        x2 = (round(rois[ni, 3]) + 1.0) * spatial_scale - 0.5
        y2 = (round(rois[ni, 4]) + 1.0) * spatial_scale - 0.5
        rw, rh = max(x2 - x1, 0.1), max(y2 - y1, 0.1)
        bw, bh = rw / ps, rh / ps
        sbw, sbh = bw / spp, bh / spp
        for ctop in range(output_dim):
            cid = ctop // ch_each
            for ph in range(ps):
                for pw in range(ps):
                    part_h = int(np.floor(ph / ps * part))
                    part_w = int(np.floor(pw / ps * part))
                    tx = 0.0 if no_trans else trans[ni, cid, 0, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else trans[ni, cid, 1, part_h, part_w] * trans_std
                    ws = pw * bw + x1 + tx * rw
                    hs = ph * bh + y1 + ty * rh
                    gw = min(max(int(pw * gs / ps), 0), gs - 1)
                    gh = min(max(int(ph * gs / ps), 0), gs - 1)
                    cin = (ctop * gs + gh) * gs + gw
                    plane = features[bi, :, :, cin]
                    s, cnt = 0.0, 0
                    for ih in range(spp):
                        for iw in range(spp):
                            x = ws + iw * sbw
                            y = hs + ih * sbh
                            if x < -0.5 or x > w - 0.5 or y < -0.5 or y > h - 0.5:
                                continue
                            x = min(max(x, 0.0), w - 1.0)
                            y = min(max(y, 0.0), h - 1.0)
                            s += interp(plane, x, y)
                            cnt += 1
                    out[ni, ph, pw, ctop] = 0.0 if cnt == 0 else s / cnt
    return out


def test_deform_psroi_pool_matches_brute(rng):
    gs, output_dim, ps, spp, part = 2, 4, 3, 2, 3
    c = output_dim * gs * gs
    features = rng.standard_normal((2, 12, 14, c)).astype(np.float32)
    rois = np.array([[0, 1, 1, 8, 9], [1, 2, 3, 12, 10]], np.float32)
    trans = (rng.standard_normal((2, 2, 2, part, part)) * 0.5).astype(np.float32)
    got = np.asarray(deform_psroi_pool(
        jnp.asarray(features), jnp.asarray(rois), jnp.asarray(trans),
        spatial_scale=0.5, output_dim=output_dim, pooled_size=ps,
        group_size=gs, part_size=part, sample_per_part=spp, trans_std=0.2,
    ))
    want = brute(features, rois, trans, 0.5, output_dim, ps, gs, part, spp, 0.2, False)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_deform_psroi_pool_no_trans(rng):
    gs, output_dim, ps, spp = 1, 6, 2, 3
    features = rng.standard_normal((1, 10, 10, 6)).astype(np.float32)
    rois = np.array([[0, 0, 0, 9, 9]], np.float32)
    got = np.asarray(deform_psroi_pool(
        jnp.asarray(features), jnp.asarray(rois), None, spatial_scale=1.0,
        output_dim=output_dim, pooled_size=ps, group_size=gs,
        sample_per_part=spp, no_trans=True,
    ))
    want = brute(features, rois, None, 1.0, output_dim, ps, gs, ps, spp, 0.1, True)
    np.testing.assert_allclose(got, want, atol=2e-4)
