"""Interleaved A/B: production fused_encoder_attention vs exact scratch replica."""
import functools, statistics, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import unilm_tpu.ops.flash_attention as fa

B, T, H, D = 128, 197, 12, 64
ITERS = 300
rng = jax.random.PRNGKey(0)

q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
bias = jax.random.normal(rng, (1, H, T, T), jnp.bfloat16)

def scratch(q, k, v, bias):
    Bq, Tq, Hq, Dq = q.shape
    S = k.shape[1]
    Tp = -(-Tq // 8) * 8
    Sp = -(-S // 8) * 8
    qf = jnp.pad(q.reshape(Bq, Tq, Hq*Dq), ((0,0),(0,Tp-Tq),(0,0)))
    kf = jnp.pad(k.reshape(Bq, S, Hq*Dq), ((0,0),(0,Sp-S),(0,0)))
    vf = jnp.pad(v.reshape(Bq, S, Hq*Dq), ((0,0),(0,Sp-S),(0,0)))
    LOG2E = 1.4426950408889634
    b = bias.astype(jnp.float32) * LOG2E
    b = jnp.pad(b, ((0,0),(0,0),(0,Tp-Tq),(0,Sp-S)), constant_values=fa.NEG_INF)

    def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
        for h in range(Hq):
            sl = slice(h*Dq, (h+1)*Dq)
            qh = q_ref[0, :, sl] * jnp.asarray(0.125*LOG2E, q_ref.dtype)
            s = jax.lax.dot_general(qh, k_ref[0, :, sl], (((1,),(1,)),((),())),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[0, h]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2((s - m).astype(q_ref.dtype))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = jax.lax.dot_general(p, v_ref[0, :, sl], (((1,),(0,)),((),())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (o * (1.0/l)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(Bq,),
            in_specs=[
                pl.BlockSpec((1, Tp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Sp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Sp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Hq, Tp, Sp), lambda bb: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tp, Hq*Dq), lambda bb: (bb, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Bq, Tp, Hq*Dq), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(qf, kf, vf, b)
    return out[:, :Tq].reshape(Bq, Tq, Hq, Dq)


def old(q, k, v, bias):
    Bq, Tq, Hq, Dq = q.shape
    S = k.shape[1]
    Tp = -(-Tq // 8) * 8
    Sp = -(-S // 8) * 8
    qf = jnp.pad(q.reshape(Bq, Tq, Hq*Dq), ((0,0),(0,Tp-Tq),(0,0)))
    kf = jnp.pad(k.reshape(Bq, S, Hq*Dq), ((0,0),(0,Sp-S),(0,0)))
    vf = jnp.pad(v.reshape(Bq, S, Hq*Dq), ((0,0),(0,Sp-S),(0,0)))
    LOG2E = 1.4426950408889634
    b = bias.astype(jnp.float32) * LOG2E
    b = jnp.pad(b, ((0,0),(0,0),(0,Tp-Tq),(0,Sp-S)), constant_values=fa.NEG_INF)

    def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
        for h in range(Hq):
            sl = slice(h*Dq, (h+1)*Dq)
            qh = q_ref[0, :, sl] * jnp.asarray(0.125*LOG2E, q_ref.dtype)
            s = jax.lax.dot_general(qh, k_ref[0, :, sl], (((1,),(1,)),((),())),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[0, h]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, :, sl], (((1,),(0,)),((),())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(Bq,),
            in_specs=[
                pl.BlockSpec((1, Tp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Sp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Sp, Hq*Dq), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, Hq, Tp, Sp), lambda bb: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tp, Hq*Dq), lambda bb: (bb, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Bq, Tp, Hq*Dq), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bq * Hq * Tp * Sp * Dq,
            bytes_accessed=(qf.size + kf.size * 2) * 2,
            transcendentals=Bq * Hq * Tp * Sp,
        ),
    )(qf, kf, vf, b)
    return out[:, :Tq].reshape(Bq, Tq, Hq, Dq)

def mkloop(f):
    def loop(q, k, v, bias):
        def body(i, acc):
            return acc + jnp.sum(f(q + acc*0, k, v, bias, 0.125) if f is not scratch
                                 else jnp.sum(scratch(q + acc*0, k, v, bias).astype(jnp.float32)))
        return 0.0
    # simpler: build per-f loop explicitly
    def loop2(q, k, v, bias):
        def body(i, acc):
            if f is scratch or f is old:
                o = f(q + acc*0, k, v, bias)
            else:
                o = f(q + acc*0, k, v, bias, 0.125)
            return acc + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    return jax.jit(loop2)

prod = mkloop(fa.fused_encoder_attention)
scr = mkloop(scratch)
oldl = mkloop(old)
float(prod(q, k, v, bias)); float(scr(q, k, v, bias)); float(oldl(q, k, v, bias))
for rep in range(3):
    for name, fn in (("prod", prod), ("scratch", scr), ("old", oldl)):
        t0 = time.time(); float(fn(q, k, v, bias)); t = time.time()-t0
        print(f"rep{rep} {name}: {(max(t-0.030,1e-6))/ITERS*1e3:.3f} ms/call", flush=True)
