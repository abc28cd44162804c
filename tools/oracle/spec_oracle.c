/* Spectrogram oracle: replicates the JS binding's spectrogram()
 * (js/soundswallower.c:88-112) standalone — mel log-spectra via the
 * reference fe with log_spec forced to RAW_LOG_SPEC / SMOOTH_LOG_SPEC —
 * and dumps both variants for parity testing.  Test-tooling only.
 *
 * Usage: spec_oracle <modeldir> <rawfile(int16)> <outdir>
 * Outputs: spec_raw.f32, spec_smooth.f32  [n_frames x nfilt] float32
 */
#include <stdio.h>
#include <stdlib.h>
#include <soundswallower/fe.h>
#include <soundswallower/decoder.h>
#include <soundswallower/configuration.h>
#include <soundswallower/ckd_alloc.h>

static void *read_file(const char *path, size_t *len) {
    FILE *fh = fopen(path, "rb");
    void *data;
    if (fh == NULL) { perror(path); exit(1); }
    fseek(fh, 0, SEEK_END);
    *len = ftell(fh);
    fseek(fh, 0, SEEK_SET);
    data = malloc(*len);
    if (fread(data, 1, *len, fh) != *len) { perror(path); exit(1); }
    fclose(fh);
    return data;
}

static void dump_spec(fe_t *fe, float32 *pcm, size_t nsamp,
                      const char *path, int smooth) {
    /* body of js/soundswallower.c:88-112 spectrogram() */
    config_t *config = fe_get_config(fe);
    float32 **spec;
    size_t nfr, nfeat;
    int rv, prev_spec, prev_ncep;
    FILE *out;
    float32 *p = pcm;
    size_t ns = nsamp;

    nfeat = config_int(config, "nfilt");
    nfr = fe_process_float32(fe, NULL, &ns, NULL, 0);
    prev_spec = fe->log_spec;
    prev_ncep = fe->feature_dimension;
    fe->log_spec = smooth ? SMOOTH_LOG_SPEC : RAW_LOG_SPEC;
    fe->feature_dimension = nfeat;

    spec = (float32 **)ckd_calloc_2d(nfr, nfeat, 4);
    fe_start(fe);
    rv = fe_process_float32(fe, &p, &ns, spec, nfr);
    rv += fe_end(fe, spec + rv, nfr - rv);

    fe->log_spec = prev_spec;
    fe->feature_dimension = prev_ncep;

    out = fopen(path, "wb");
    fwrite(spec[0], sizeof(float32), rv * nfeat, out);
    fclose(out);
    printf("%s: %d frames x %zu\n", path, rv, nfeat);
    ckd_free_2d(spec);
}

int main(int argc, char *argv[]) {
    char path[4096], json[4096];
    config_t *config;
    decoder_t *d;
    int16 *raw;
    float32 *pcm;
    size_t raw_len, n_samps, i;

    if (argc < 4) {
        fprintf(stderr, "usage: %s <modeldir> <rawfile> <outdir>\n", argv[0]);
        return 1;
    }
    snprintf(json, sizeof(json), "{\"hmm\": \"%s\"}", argv[1]);
    config = config_parse_json(NULL, json);
    d = decoder_init(config);
    if (d == NULL) { fprintf(stderr, "decoder_init failed\n"); return 1; }

    raw = read_file(argv[2], &raw_len);
    n_samps = raw_len / 2;
    /* the JS API feeds float32 in [-1, 1] */
    pcm = malloc(n_samps * sizeof(float32));
    for (i = 0; i < n_samps; i++)
        pcm[i] = raw[i] / 32768.0f;

    snprintf(path, sizeof(path), "%s/spec_raw.f32", argv[3]);
    dump_spec(d->acmod->fe, pcm, n_samps, path, 0);
    snprintf(path, sizeof(path), "%s/spec_smooth.f32", argv[3]);
    dump_spec(d->acmod->fe, pcm, n_samps, path, 1);

    decoder_free(d);
    free(raw);
    free(pcm);
    return 0;
}
