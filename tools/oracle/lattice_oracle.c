/* Lattice/nbest/posterior oracle: runs the reference FSG decoder in
 * compallsen mode (so the search consumes exactly the senone scores we
 * dump) over a JSGF grammar and dumps the resulting word lattice, the
 * bestpath hypothesis, per-link posteriors, and the A* N-best list for
 * parity testing of lattice.py.  Test-tooling only.
 *
 * Usage: lattice_oracle <modeldir> <rawfile> <outdir> <jsgf>
 *
 * Outputs in <outdir>:
 *   senscr.i16    [n_frames x n_sen] int16 compallsen senone scores
 *                 (identical to what the search consumed)
 *   segs.txt      word sf ef ascr lscr from the FSG search backtrace
 *   hyp.txt       first-pass hypothesis
 *   lattice.txt   NFRAMES n / NODE word sf fef lef node_id /
 *                 LINK from_idx to_idx ascr ef (idx into NODE order)
 *   bestpath.txt  line 1: bestpath hyp; line 2: norm (lattice->norm);
 *                 then LINKPOST from_idx to_idx post alpha beta
 *   nbest.txt     up to 20 lines: score <tab> hyp (A* order)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <soundswallower/decoder.h>
#include <soundswallower/acmod.h>
#include <soundswallower/lattice.h>
#include <soundswallower/configuration.h>

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

int main(int argc, char *argv[]) {
    const char *modeldir, *rawfile, *outdir, *jsgf;
    char path[4096], json[4096];
    config_t *config;
    decoder_t *d;
    lattice_t *dag;
    latnode_t *node;
    int16 *raw;
    size_t raw_len, n_samps;
    FILE *out;
    int n_nodes, i;
    double ascale;

    if (argc < 5) {
        fprintf(stderr, "usage: %s <modeldir> <rawfile> <outdir> <jsgf>\n",
                argv[0]);
        return 1;
    }
    modeldir = argv[1];
    rawfile = argv[2];
    outdir = argv[3];
    jsgf = argv[4];

    snprintf(json, sizeof(json),
             "{\"hmm\": \"%s\", \"jsgf\": \"%s\", \"compallsen\": true}",
             modeldir, jsgf);
    config = config_parse_json(NULL, json);
    d = decoder_init(config);
    if (d == NULL) { fprintf(stderr, "decoder_init failed\n"); return 1; }
    ascale = config_float(config, "ascale");

    raw = read_file(rawfile, &raw_len);
    n_samps = raw_len / 2;

    decoder_start_utt(d);
    decoder_process_int16(d, raw, n_samps, FALSE, TRUE);
    decoder_end_utt(d);

    /* Senone scores: rewind and re-score in the same compallsen mode the
     * search used (acmod buffers retain the features; the PTM top-N
     * history ring continues from the decode, which is bit-identical for
     * these models -- the full-rescan path recovers the exact top-N). */
    {
        int n_sen = bin_mdef_n_sen(d->acmod->mdef);
        int nfr = 0;
        acmod_rewind(d->acmod);
        snprintf(path, sizeof(path), "%s/senscr.i16", outdir);
        out = fopen(path, "wb");
        while (d->acmod->n_feat_frame > 0) {
            int frame_idx = d->acmod->output_frame;
            int16 const *scr = acmod_score(d->acmod, &frame_idx);
            if (scr == NULL) break;
            fwrite(scr, sizeof(int16), n_sen, out);
            acmod_advance(d->acmod);
            nfr++;
        }
        fclose(out);
        printf("senscr: %d frames x %d\n", nfr, n_sen);
    }

    /* First-pass segs + hyp */
    {
        seg_iter_t *seg;
        snprintf(path, sizeof(path), "%s/segs.txt", outdir);
        out = fopen(path, "w");
        for (seg = decoder_seg_iter(d); seg; seg = seg_iter_next(seg)) {
            int sf, ef;
            int32 ascr, lscr;
            seg_iter_frames(seg, &sf, &ef);
            seg_iter_prob(seg, &ascr, &lscr);
            fprintf(out, "%s %d %d %d %d\n", seg_iter_word(seg),
                    sf, ef, ascr, lscr);
        }
        fclose(out);
        snprintf(path, sizeof(path), "%s/hyp.txt", outdir);
        out = fopen(path, "w");
        fprintf(out, "%s\n", decoder_hyp(d, NULL));
        fclose(out);
        printf("hyp: %s\n", decoder_hyp(d, NULL));
    }

    dag = decoder_lattice(d);
    if (dag == NULL) { fprintf(stderr, "no lattice\n"); return 1; }

    /* Lattice structure.  Node index = position in dag->nodes order. */
    n_nodes = 0;
    for (node = dag->nodes; node; node = node->next)
        node->id = n_nodes++;   /* repurpose id as dump index */
    snprintf(path, sizeof(path), "%s/lattice.txt", outdir);
    out = fopen(path, "w");
    fprintf(out, "NFRAMES %d\n", lattice_n_frames(dag));
    for (node = dag->nodes; node; node = node->next)
        fprintf(out, "NODE %s %d %d %d %d\n",
                dict_wordstr(d->dict, node->wid), node->sf,
                node->fef, node->lef, node->node_id);
    for (node = dag->nodes; node; node = node->next) {
        latlink_list_t *x;
        for (x = node->exits; x; x = x->next)
            fprintf(out, "LINK %d %d %d %d\n", x->link->from->id,
                    x->link->to->id, x->link->ascr, x->link->ef);
    }
    fclose(out);
    printf("lattice: %d nodes\n", n_nodes);

    /* Bestpath + posteriors */
    {
        latlink_t *best = lattice_bestpath(dag, ascale);
        int32 post = lattice_posterior(dag, ascale);
        snprintf(path, sizeof(path), "%s/bestpath.txt", outdir);
        out = fopen(path, "w");
        fprintf(out, "%s\n", best ? lattice_hyp(dag, best) : "(null)");
        fprintf(out, "NORM %d POST %d\n", dag->norm, post);
        for (node = dag->nodes; node; node = node->next) {
            latlink_list_t *x;
            for (x = node->exits; x; x = x->next) {
                int32 lp, a;
                lp = ps_latlink_prob(dag, x->link, &a);
                fprintf(out, "LINKPOST %d %d %d %d %d\n",
                        x->link->from->id, x->link->to->id, lp,
                        x->link->alpha, x->link->beta);
            }
        }
        fclose(out);
        printf("bestpath: %s\n", best ? lattice_hyp(dag, best) : "(null)");
    }

    /* A* N-best */
    {
        astar_search_t *astar = astar_search_start(dag, 0, -1, -1, -1);
        snprintf(path, sizeof(path), "%s/nbest.txt", outdir);
        out = fopen(path, "w");
        for (i = 0; i < 20; i++) {
            latpath_t *p = astar_next(astar);
            if (p == NULL) break;
            fprintf(out, "%d\t%s\n", p->score, astar_hyp(astar, p));
        }
        fclose(out);
        astar_finish(astar);
        printf("nbest: %d paths\n", i);
    }

    decoder_free(d);
    free(raw);
    return 0;
}
