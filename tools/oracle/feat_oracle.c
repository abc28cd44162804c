/* Golden-dump harness: dynamic feature computation for every feature
 * type (feat_init_s3file registry), optional LDA + subvector spec.
 *
 * Usage:
 *   feat_oracle <mfcc.f32> <ncep> <nframes> <feat_type> <cmn> <out.f32>
 *               [<ldafile> <ldadim> [<svspec>]]
 *
 * Reads float32 MFCC frames, runs feat_s2mfc2feat_live (beginutt=1,
 * endutt=1, the full-utterance path), and writes, per frame, every
 * stream's feat_dimension2 values concatenated as float32.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <soundswallower/ckd_alloc.h>
#include <soundswallower/configuration.h>
#include <soundswallower/feat.h>

int
main(int argc, char *argv[])
{
    config_t *config;
    feat_t *fcb;
    FILE *fp;
    float *buf;
    mfcc_t **in_feats, ***out_feats;
    int32 ncep, nfr, nout, i, j, k;

    if (argc < 7) {
        fprintf(stderr,
                "usage: %s <mfcc.f32> <ncep> <nframes> <feat_type> <cmn> "
                "<out.f32> [<ldafile> <ldadim> [<svspec>]]\n",
                argv[0]);
        return 1;
    }
    ncep = atoi(argv[2]);
    nfr = atoi(argv[3]);

    buf = ckd_calloc(nfr * ncep, sizeof(float));
    fp = fopen(argv[1], "rb");
    if (fp == NULL || (int32)fread(buf, sizeof(float), nfr * ncep, fp)
        != nfr * ncep) {
        fprintf(stderr, "failed to read %d x %d floats from %s\n",
                nfr, ncep, argv[1]);
        return 1;
    }
    fclose(fp);

    config = config_init(NULL);
    config_set_str(config, "feat", argv[4]);
    config_set_str(config, "cmn", argv[5]);
    config_set_str(config, "varnorm", "no");
    config_set_int(config, "ceplen", ncep);
    if (argc > 8) {
        config_set_str(config, "lda", argv[7]);
        config_set_int(config, "ldadim", atoi(argv[8]));
    }
    if (argc > 9)
        config_set_str(config, "svspec", argv[9]);

    fcb = feat_init(config);
    if (fcb == NULL) {
        fprintf(stderr, "feat_init failed\n");
        return 1;
    }

    in_feats = (mfcc_t **)ckd_alloc_2d_ptr(nfr, ncep, buf, sizeof(mfcc_t));
    out_feats = feat_array_alloc(fcb, nfr + feat_window_size(fcb));
    nout = feat_s2mfc2feat_live(fcb, in_feats, &nfr, 1, 1, out_feats);
    if (nout < 0) {
        fprintf(stderr, "feat_s2mfc2feat_live failed\n");
        return 1;
    }

    fp = fopen(argv[6], "wb");
    for (i = 0; i < nout; i++)
        for (j = 0; j < (int32)feat_dimension1(fcb); j++)
            for (k = 0; k < (int32)feat_dimension2(fcb, j); k++) {
                float v = (float)out_feats[i][j][k];
                fwrite(&v, sizeof(float), 1, fp);
            }
    fclose(fp);
    printf("%d frames x %d dims (%d streams)\n", nout,
           (int)feat_dimension(fcb), (int)feat_dimension1(fcb));

    feat_array_free(out_feats);
    ckd_free(in_feats);
    ckd_free(buf);
    feat_free(fcb);
    config_free(config);
    return 0;
}
