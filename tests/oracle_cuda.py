"""Sequential numpy oracle following the reference CUDA kernels' exact op order.

The BASELINE correctness target is fp32 agreement with the CUDA reference under
a fixed seed, but no CUDA hardware exists here — so this module re-expresses
`/root/reference/megastep/src/kernels.cu` as slow, obvious, scalar-order numpy
(float32 throughout, same branch structure, same epsilons), and the tests in
``test_oracle_cuda.py`` compare the engine against it. In particular it
implements the two behaviors PARITY.md documents as divergences, so their size
can finally be measured instead of assumed:

* the sequential z-fighting tie-break (``raycast_kernel``, kernels.cu:326-383:
  accept a line only if ``s < nearest_s - 1e-4``);
* per-pixel dynamic-line lighting (``shader_kernel``, kernels.cu:432-439:
  ``light_intensity`` evaluated at the exact hit point of dynamic lines).

This is an independent re-expression of the kernels' documented math, not a
translation of their code: everything here is plain numpy scalar arithmetic.
"""
import numpy as np

f32 = np.float32

PARALLEL_EPS = f32(1e-3)
Z_OFFSET = f32(1e-4)
AMBIENT = f32(.1)
LUMINANCE = f32(2.)


def _cross(vx, vy, wx, wy):
    return f32(vx * wy - vy * wx)


def intersect(px, py, ux, uy, qx, qy, vx, vy):
    """kernels.cu:67-88: infinite-line intersection P+sU = Q+tV, (inf, inf) when
    near-parallel."""
    uxv = _cross(ux, uy, vx, vy)
    if abs(uxv) < PARALLEL_EPS:
        return f32(np.inf), f32(np.inf)
    pqx, pqy = f32(qx - px), f32(qy - py)
    return (f32(_cross(pqx, pqy, vx, vy) / uxv),
            f32(_cross(pqx, pqy, ux, uy) / uxv))


def project(px, py, ux, uy, qx, qy):
    """kernels.cu:92-104: projection of Q on P+sU → (s, distance)."""
    u = f32(np.sqrt(f32(ux * ux + uy * uy)) + f32(1e-6))
    pqx, pqy = f32(qx - px), f32(qy - py)
    s = f32((pqx * ux + pqy * uy) / (u * u))
    d = f32(abs(_cross(pqx, pqy, ux, uy)) / u)
    return s, d


def sensibilize(p):
    """kernels.cu:110-118: NaN→0, then clamp(0.99·p, 0, 1)."""
    if np.isnan(p):
        return f32(0.)
    return f32(max(min(p * f32(.99), 1.), 0.))


def collision_disc(p0, v0, p1, v1, agent_radius):
    """kernels.cu:120-135: moving disc vs moving disc."""
    r = f32(1.001 * 2. * agent_radius)
    x = f32(1.)
    dvx, dvy = f32(v0[0] - v1[0]), f32(v0[1] - v1[1])
    s, d = project(p0[0], p0[1], dvx, dvy, p1[0], p1[1])
    if (0 < s) and (d < r):
        vlen = f32(np.sqrt(dvx * dvx + dvy * dvy))
        backoff = f32(np.sqrt(r * r - d * d) / vlen)
        x = min(x, sensibilize(f32(s - backoff)))
    return x


def collision_line(p, v, la, lb, agent_radius):
    """kernels.cu:137-171: moving disc vs static segment, four sub-tests in the
    kernel's order (cross mid-segment, endpoint a, endpoint b, sidle)."""
    r = f32(1.001 * agent_radius)
    x = f32(1.)
    lvx, lvy = f32(lb[0] - la[0]), f32(lb[1] - la[1])

    ms, mt = intersect(p[0], p[1], v[0], v[1], la[0], la[1], lvx, lvy)
    if (0 < ms < 1) and (0 < mt < 1):
        _, dp = project(la[0], la[1], lvx, lvy, p[0], p[1])
        x = min(x, sensibilize(f32((1 - r / dp) * ms)))

    vlen = f32(np.sqrt(v[0] * v[0] + v[1] * v[1]))
    for end in (la, lb):
        s, d = project(p[0], p[1], v[0], v[1], end[0], end[1])
        if (0 < s) and (d < r):
            backoff = f32(np.sqrt(r * r - d * d) / vlen)
            x = min(x, sensibilize(f32(s - backoff)))

    q = (f32(p[0] + v[0]), f32(p[1] + v[1]))
    ss, sd = project(la[0], la[1], lvx, lvy, q[0], q[1])
    if (0 < ss < 1) and (sd < r):
        _, dp = project(la[0], la[1], lvx, lvy, p[0], p[1])
        x = min(x, sensibilize(f32((dp - r) / (dp - sd))))
    return x


def progress(scenery, positions, velocity, fps, agent_radius):
    """collision_kernel, kernels.cu:180-211: per (env, agent) min over the other
    agents then the static lines (dynamic head slots skipped)."""
    lines = np.asarray(scenery.lines, f32)
    widths = np.asarray(scenery.lines_width)
    N, A = positions.shape[:2]
    DF = scenery.n_dynamic
    out = np.ones((N, A), f32)
    for n in range(N):
        for d0 in range(A):
            p0 = positions[n, d0]
            m0 = (f32(velocity[n, d0, 0] / fps), f32(velocity[n, d0, 1] / fps))
            x = f32(1.)
            for d1 in range(A):
                if d0 != d1:
                    m1 = (f32(velocity[n, d1, 0] / fps),
                          f32(velocity[n, d1, 1] / fps))
                    x = min(x, collision_disc(p0, m0, positions[n, d1], m1,
                                              agent_radius))
            for l in range(DF, widths[n]):
                x = min(x, collision_line(p0, m0, lines[n, l, 0],
                                          lines[n, l, 1], agent_radius))
            out[n, d0] = x
    return out


def ray_y(r, R, half_screen_width):
    """kernels.cu:235-237."""
    return f32((R - 2 * r - 1) * half_screen_width / R)


def light_intensity(lines, widths, lights, lights_width, C, n, af):
    """kernels.cu:239-268: ambient + per-light hard-shadow contribution; static
    lines only occlude (the first ``af`` slots are dynamic); the .999 cutoff
    keeps texels on the occluder itself lit."""
    intensity = AMBIENT
    for i in range(lights_width[n]):
        Ix, Iy, Ii = (f32(v) for v in lights[n, i, :3])
        unobstructed = True
        cx, cy = f32(C[0] - Ix), f32(C[1] - Iy)
        for l1 in range(af, widths[n]):
            la, lb = lines[n, l1]
            s, t = intersect(Ix, Iy, cx, cy, la[0], la[1],
                             f32(lb[0] - la[0]), f32(lb[1] - la[1]))
            if (t > 0.) and (t < 1.) and (s > 0.) and (s < .999):
                unobstructed = False
        if unobstructed:
            d2 = f32(cx * cx + cy * cy)
            intensity = f32(intensity + LUMINANCE * Ii / max(d2, f32(1.)))
    return f32(min(intensity, 1.))


def bake(scenery):
    """baking_kernel, kernels.cu:270-291: per-texel midpoint lighting."""
    lines = np.asarray(scenery.lines, f32)
    widths = np.asarray(scenery.lines_width)
    lights = np.asarray(scenery.lights, f32)
    lwidths = np.asarray(scenery.lights_width)
    starts = np.asarray(scenery.line_tex_starts)
    twidths = np.asarray(scenery.line_tex_widths)
    af = scenery.n_dynamic
    N, T = np.asarray(scenery.baked).shape
    out = np.zeros((N, T), f32)
    for n in range(N):
        for l in range(widths[n]):
            for k in range(twidths[n, l]):
                loc = f32((k + .5) / twidths[n, l])
                a, b = lines[n, l]
                C = (f32(a[0] * (1 - loc) + b[0] * loc),
                     f32(a[1] * (1 - loc) + b[1] * loc))
                out[n, starts[n, l] + k] = light_intensity(
                    lines, widths, lights, lwidths, C, n, af)
    return out


def draw(scenery, angles, positions):
    """draw_kernel, kernels.cu:297-318: rotate + translate the agent model into
    the dynamic head slots; cospif/sinpif = cos/sin of pi·(angle/180)."""
    lines = np.array(scenery.lines, f32, copy=True)
    model = np.asarray(scenery.model, f32)
    M = len(model)
    N, A = angles.shape
    for n in range(N):
        for a in range(A):
            ang = f32(angles[n, a] / 180.)
            c, s = f32(np.cos(np.pi * ang)), f32(np.sin(np.pi * ang))
            px, py = positions[n, a]
            for m in range(M):
                for e in range(2):
                    mx, my = model[m, e]
                    lines[n, a * M + m, e, 0] = f32(c * mx - s * my + px)
                    lines[n, a * M + m, e, 1] = f32(s * mx + c * my + py)
    return lines


def raycast(lines, widths, angles, positions, res, half_screen_width,
            agent_radius):
    """raycast_kernel, kernels.cu:326-383 — including the sequential z-fighting
    tie-break: a later line wins only if ``s < nearest_s - 1e-4``."""
    N, A = angles.shape
    indices = np.full((N, A, res), -1, np.int32)
    locations = np.full((N, A, res), np.nan, f32)
    dots = np.full((N, A, res), np.nan, f32)
    distances = np.full((N, A, res), np.inf, f32)
    for n in range(N):
        for a in range(A):
            ang = f32(angles[n, a] / 180.)
            c, s = f32(np.cos(np.pi * ang)), f32(np.sin(np.pi * ang))
            px, py = positions[n, a]
            for r in range(res):
                uy = ray_y(r, res, half_screen_width)
                rux, ruy = f32(c - s * uy), f32(s + c * uy)
                rlen = f32(np.sqrt(rux * rux + ruy * ruy))
                nearest_idx, nearest_s = -1, f32(np.inf)
                nearest_loc = nearest_dot = f32(np.nan)
                for l in range(widths[n]):
                    la, lb = lines[n, l]
                    vx, vy = f32(lb[0] - la[0]), f32(lb[1] - la[1])
                    qs, qt = intersect(px, py, rux, ruy, la[0], la[1], vx, vy)
                    dtop = f32(rux * vx + ruy * vy)
                    dbot = f32(rlen * np.sqrt(vx * vx + vy * vy))
                    d = f32(dtop / (dbot + f32(1e-6)))
                    hit = (0 <= qt) and (qt <= 1)
                    better = (agent_radius / rlen < qs) and \
                        (qs < nearest_s - Z_OFFSET)
                    if hit and better:
                        nearest_idx, nearest_s = l, qs
                        nearest_loc, nearest_dot = qt, d
                indices[n, a, r] = nearest_idx
                locations[n, a, r] = nearest_loc
                dots[n, a, r] = nearest_dot
                distances[n, a, r] = f32(nearest_s * rlen)
    return dict(indices=indices, locations=locations, dots=dots,
                distances=distances)


def tex_filter(x, w):
    """filter, kernels.cu:394-405."""
    y = f32(min(x * (w + 1), w - 1))
    l = int(max(y - 1, 0))
    r = int(min(y, w - 1))
    ld = f32(abs(y - (l + 1)) + f32(1e-3))
    rd = f32(abs(y - (r + 1)) + f32(1e-3))
    return l, r, f32(rd / (ld + rd)), f32(ld / (ld + rd))


def shade(scenery, lines_now, rc, baked):
    """shader_kernel, kernels.cu:407-450 — dynamic lines (l0 < af) get their
    lighting evaluated at the exact hit point, per pixel."""
    widths = np.asarray(scenery.lines_width)
    lights = np.asarray(scenery.lights, f32)
    lwidths = np.asarray(scenery.lights_width)
    textures = np.asarray(scenery.textures, f32)
    starts = np.asarray(scenery.line_tex_starts)
    twidths = np.asarray(scenery.line_tex_widths)
    af = scenery.n_dynamic
    N, A, R = rc['indices'].shape
    screen = np.zeros((N, A, R, 3), f32)
    for n in range(N):
        for a in range(A):
            for r in range(R):
                l0 = rc['indices'][n, a, r]
                if l0 < 0:
                    continue
                loc = rc['locations'][n, a, r]
                t0 = starts[n, l0]
                fl, fr, lw, rw = tex_filter(loc, twidths[n, l0])
                tex_l, tex_r = textures[n, t0 + fl], textures[n, t0 + fr]
                if l0 < af:
                    la, lb = lines_now[n, l0]
                    C = (f32(la[0] * (1 - loc) + lb[0] * loc),
                         f32(la[1] * (1 - loc) + lb[1] * loc))
                    intensity = light_intensity(lines_now, widths, lights,
                                                lwidths, C, n, af)
                else:
                    intensity = f32(lw * baked[n, t0 + fl] + rw * baked[n, t0 + fr])
                lam = f32(1 - rc['dots'][n, a, r] ** 2)
                for ch in range(3):
                    screen[n, a, r, ch] = f32(
                        lam * intensity * (lw * tex_l[ch] + rw * tex_r[ch]))
    return screen
