import time
import loraine_tpu as lt
for name, opts in [('theta1', {'kit':0,'eDIMACS':1e-6,'initpoint':1,'verb':0}),
                   ('maxG11', {'kit':0,'eDIMACS':1e-5,'initpoint':1,'datarank':-1,'verb':0}),
                   ('thetaG11', {'kit':0,'eDIMACS':1e-5,'initpoint':1,'datarank':-1,'verb':0})]:
    t0=time.time()
    r = lt.solve_sdpa(f'tests/data/{name}.dat-s', dict(opts))
    print(name, 'solve1', round(time.time()-t0,1), r.status_name, 'obj', round(r.objective,4), 'iters', r.iterations, flush=True)
    t0=time.time()
    r = lt.solve_sdpa(f'tests/data/{name}.dat-s', dict(opts))
    periter = sum(r.iteration_times[1:])/max(1,len(r.iteration_times)-1)
    print(name, 'solve2', round(time.time()-t0,2), 'periter', round(periter,4), 'it/s', round(1/periter,2), flush=True)
