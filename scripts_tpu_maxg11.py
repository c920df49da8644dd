import time
import loraine_tpu as lt
t0 = time.time()
r = lt.solve_sdpa('tests/data/maxG11.dat-s', {'kit':0,'eDIMACS':1e-5,'initpoint':1,'datarank':-1,'verb':1})
print('maxG11 total', round(time.time()-t0,1), r.status_name, r.objective, flush=True)
