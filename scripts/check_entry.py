import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
sys.path.insert(0, "/root/repo")
import jax, time
import __graft_entry__ as ge

t0 = time.time()
fn, args = ge.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry ok:", out.shape, "in", round(time.time()-t0, 1), "s")

t0 = time.time()
ge.dryrun_multichip(8)
print("dryrun ok in", round(time.time()-t0, 1), "s")
