import numpy as np, sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from gcssl_tpu.data.yolo import load_yolo_txt

RAW = Path("/root/repo/runs/loop_r2/two_stage/stage2/high/labels")
CAL = Path(sys.argv[1]) if len(sys.argv)>1 else Path("/root/repo/runs/loop_r2/self_calibrated")
GT = Path("/root/reference/datasets/500_100_100/unlabels/labels")

def iou_mat(a, b):
    ax1, ay1 = a[:,0]-a[:,2]/2, a[:,1]-a[:,3]/2; ax2, ay2 = a[:,0]+a[:,2]/2, a[:,1]+a[:,3]/2
    bx1, by1 = b[:,0]-b[:,2]/2, b[:,1]-b[:,3]/2; bx2, by2 = b[:,0]+b[:,2]/2, b[:,1]+b[:,3]/2
    ix = np.maximum(0, np.minimum(ax2[:,None],bx2[None])-np.maximum(ax1[:,None],bx1[None]))
    iy = np.maximum(0, np.minimum(ay2[:,None],by2[None])-np.maximum(ay1[:,None],by1[None]))
    inter = ix*iy
    return inter/np.maximum(((ax2-ax1)*(ay2-ay1))[:,None]+((bx2-bx1)*(by2-by1))[None]-inter,1e-9)

raw_i, cal_i, w_all = [], [], []
for f in sorted(RAW.glob("*.txt")):
    g = GT/f.name; c = CAL/f.name
    if not g.exists() or not c.exists(): continue
    _, rb, _ = load_yolo_txt(f, min_fields=5)
    _, cb, _ = load_yolo_txt(c, min_fields=5)
    _, gb, _ = load_yolo_txt(g)
    if not len(rb) or not len(gb) or len(rb)!=len(cb): continue
    # assign each raw box its best GT; calibrated IoU vs that SAME gt
    m = iou_mat(rb, gb); j = m.argmax(1); ri = m.max(1)
    ci = iou_mat(cb, gb)[np.arange(len(cb)), j]
    raw_i.append(ri); cal_i.append(ci); w_all.append(rb[:,2]*rb[:,3])
raw_i = np.concatenate(raw_i); cal_i = np.concatenate(cal_i); area = np.concatenate(w_all)
d = cal_i - raw_i
print(f"n={len(d)}  mean raw {raw_i.mean():.4f} -> cal {cal_i.mean():.4f}  (d {d.mean():+.4f})")
print(f"{'raw-IoU bucket':>16} {'n':>6} {'mean dIoU':>10} {'frac_improved':>14}")
for lo, hi in [(0,0.1),(0.1,0.3),(0.3,0.5),(0.5,0.7),(0.7,0.85),(0.85,1.01)]:
    m = (raw_i>=lo)&(raw_i<hi)
    if m.sum(): print(f"{lo:.2f}-{hi:.2f}       {m.sum():>6} {d[m].mean():>+10.4f} {(d[m]>0).mean():>14.3f}")
print("by sqrt(area):")
for lo, hi in [(0,0.05),(0.05,0.1),(0.1,0.2),(0.2,1.0)]:
    m = (np.sqrt(area)>=lo)&(np.sqrt(area)<hi)
    if m.sum(): print(f"{lo:.2f}-{hi:.2f}       {m.sum():>6} {d[m].mean():>+10.4f} {(d[m]>0).mean():>14.3f}")
