/* Minimal GL stub: enough for the reference's Draw() methods to compile.
   The photonmap binary never calls GL at runtime. */
#ifndef __gl_stub_h__
#define __gl_stub_h__
#include <stddef.h>
typedef unsigned int GLenum; typedef unsigned char GLboolean;
typedef unsigned int GLbitfield; typedef void GLvoid;
typedef signed char GLbyte; typedef short GLshort; typedef int GLint;
typedef unsigned char GLubyte; typedef unsigned short GLushort;
typedef unsigned int GLuint; typedef int GLsizei; typedef float GLfloat;
typedef float GLclampf; typedef double GLdouble; typedef double GLclampd;
#define GL_FALSE 0
#define GL_TRUE 1
enum {
 GL_POINTS=1, GL_LINES, GL_LINE_LOOP, GL_LINE_STRIP, GL_TRIANGLES,
 GL_TRIANGLE_STRIP, GL_TRIANGLE_FAN, GL_QUADS, GL_QUAD_STRIP, GL_POLYGON,
 GL_LIGHT0=0x4000, GL_LIGHT1, GL_LIGHT2, GL_LIGHT3, GL_LIGHT4, GL_LIGHT5,
 GL_LIGHT6, GL_LIGHT7,
 GL_AMBIENT=0x1200, GL_DIFFUSE, GL_SPECULAR, GL_POSITION, GL_SPOT_DIRECTION,
 GL_SPOT_EXPONENT, GL_SPOT_CUTOFF, GL_CONSTANT_ATTENUATION,
 GL_LINEAR_ATTENUATION, GL_QUADRATIC_ATTENUATION,
 GL_EMISSION=0x1600, GL_SHININESS, GL_AMBIENT_AND_DIFFUSE,
 GL_FRONT=0x0404, GL_BACK=0x0405, GL_FRONT_AND_BACK=0x0408,
 GL_MODELVIEW=0x1700, GL_PROJECTION=0x1701, GL_TEXTURE=0x1702,
 GL_TEXTURE_2D=0x0DE1, GL_TEXTURE_ENV=0x2300, GL_TEXTURE_ENV_MODE=0x2200,
 GL_MODULATE=0x2100, GL_TEXTURE_MAG_FILTER=0x2800, GL_TEXTURE_MIN_FILTER,
 GL_TEXTURE_WRAP_S=0x2802, GL_TEXTURE_WRAP_T=0x2803, GL_NEAREST=0x2600,
 GL_LINEAR=0x2601, GL_LINEAR_MIPMAP_LINEAR=0x2703, GL_REPEAT=0x2901,
 GL_CLAMP=0x2900, GL_RGB=0x1907, GL_RGBA=0x1908, GL_LUMINANCE=0x1909,
 GL_UNSIGNED_BYTE=0x1401, GL_FLOAT=0x1406, GL_DEPTH_TEST=0x0B71,
 GL_LIGHTING=0x0B50, GL_NORMALIZE=0x0BA1, GL_COLOR_MATERIAL=0x0B57,
 GL_CULL_FACE=0x0B44, GL_BLEND=0x0BE2, GL_POINT_SMOOTH=0x0B10,
 GL_LINE_SMOOTH=0x0B20, GL_SRC_ALPHA=0x0302,
 GL_ONE_MINUS_SRC_ALPHA=0x0303, GL_COLOR_BUFFER_BIT=0x4000,
 GL_DEPTH_BUFFER_BIT=0x0100, GL_VIEWPORT=0x0BA2, GL_FILL=0x1B02,
 GL_LINE=0x1B01, GL_COMPILE=0x1300, GL_MAX_LIGHTS=0x0D31
};

enum {
 GL_LUMINANCE_ALPHA=0x190A, GL_ALPHA=0x1906, GL_BYTE=0x1400,
 GL_UNSIGNED_SHORT=0x1403, GL_SHORT=0x1402, GL_UNSIGNED_INT=0x1405,
 GL_INT=0x1404, GL_DOUBLE=0x140A, GL_UNPACK_ALIGNMENT=0x0CF5,
 GL_PACK_ALIGNMENT=0x0D05, GL_TEXTURE_GEN_S=0x0C60, GL_TEXTURE_GEN_T=0x0C61,
 GL_TEXTURE_GEN_MODE=0x2500, GL_OBJECT_LINEAR=0x2401, GL_EYE_LINEAR=0x2400,
 GL_OBJECT_PLANE=0x2501, GL_EYE_PLANE=0x2502, GL_SPHERE_MAP=0x2402,
 GL_LIGHT_MODEL_AMBIENT=0x0B53, GL_LIGHT_MODEL_TWO_SIDE=0x0B52,
 GL_FLAT=0x1D00, GL_SMOOTH=0x1D01, GL_SCISSOR_TEST=0x0C11,
 GL_STENCIL_BUFFER_BIT=0x0400, GL_POLYGON_OFFSET_FILL=0x8037, GL_NEAREST_MIPMAP_NEAREST=0x2700,
 GL_NEAREST_MIPMAP_LINEAR=0x2702, GL_LINEAR_MIPMAP_NEAREST=0x2701,
 GL_DECAL=0x2101, GL_BLEND_MODE=0x0BE0, GL_REPLACE=0x1E01,
 GL_ADD=0x0104, GL_CURRENT_BIT=0x00001, GL_ENABLE_BIT=0x00002000,
 GL_TRANSFORM_BIT=0x00001000, GL_ALL_ATTRIB_BITS=0xFFFFF, GL_ONE=1, GL_ZERO=0, GL_SRC_COLOR=0x0300, GL_ONE_MINUS_SRC_COLOR=0x0301, GL_DST_COLOR=0x0306, GL_ONE_MINUS_DST_COLOR=0x0307, GL_DST_ALPHA=0x0304, GL_ONE_MINUS_DST_ALPHA=0x0305, GL_CW=0x0900, GL_CCW=0x0901, GL_GREATER=0x0204, GL_LESS=0x0201, GL_LEQUAL=0x0203, GL_GEQUAL=0x0206, GL_EQUAL=0x0202, GL_NOTEQUAL=0x0205, GL_ALWAYS=0x0207, GL_NEVER=0x0200, GL_ALPHA_TEST=0x0BC0
};
#ifdef __cplusplus
extern "C" {
#endif
static inline void glBegin(GLenum m){(void)m;}
static inline void glEnd(void){}
static inline void glEnable(GLenum c){(void)c;}
static inline void glDisable(GLenum c){(void)c;}
static inline void glVertex2f(GLfloat a,GLfloat b){(void)a;(void)b;}
static inline void glVertex2d(GLdouble a,GLdouble b){(void)a;(void)b;}
static inline void glVertex3f(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glVertex3d(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glVertex3fv(const GLfloat*v){(void)v;}
static inline void glVertex3dv(const GLdouble*v){(void)v;}
static inline void glNormal3f(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glNormal3d(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glNormal3fv(const GLfloat*v){(void)v;}
static inline void glNormal3dv(const GLdouble*v){(void)v;}
static inline void glTexCoord2f(GLfloat a,GLfloat b){(void)a;(void)b;}
static inline void glTexCoord2d(GLdouble a,GLdouble b){(void)a;(void)b;}
static inline void glColor3f(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glColor3d(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glColor3fv(const GLfloat*v){(void)v;}
static inline void glColor3dv(const GLdouble*v){(void)v;}
static inline void glColor4f(GLfloat a,GLfloat b,GLfloat c,GLfloat d){(void)a;(void)b;(void)c;(void)d;}
static inline void glColor4fv(const GLfloat*v){(void)v;}
static inline void glColor4d(GLdouble a,GLdouble b,GLdouble c,GLdouble d){(void)a;(void)b;(void)c;(void)d;}
static inline void glMaterialf(GLenum f,GLenum p,GLfloat v){(void)f;(void)p;(void)v;}
static inline void glMaterialfv(GLenum f,GLenum p,const GLfloat*v){(void)f;(void)p;(void)v;}
static inline void glLightf(GLenum l,GLenum p,GLfloat v){(void)l;(void)p;(void)v;}
static inline void glLightfv(GLenum l,GLenum p,const GLfloat*v){(void)l;(void)p;(void)v;}
static inline void glLightModelfv(GLenum p,const GLfloat*v){(void)p;(void)v;}
static inline void glMatrixMode(GLenum m){(void)m;}
static inline void glLoadIdentity(void){}
static inline void glLoadMatrixf(const GLfloat*m){(void)m;}
static inline void glLoadMatrixd(const GLdouble*m){(void)m;}
static inline void glMultMatrixf(const GLfloat*m){(void)m;}
static inline void glMultMatrixd(const GLdouble*m){(void)m;}
static inline void glPushMatrix(void){}
static inline void glPopMatrix(void){}
static inline void glTranslatef(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glTranslated(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glRotatef(GLfloat a,GLfloat b,GLfloat c,GLfloat d){(void)a;(void)b;(void)c;(void)d;}
static inline void glRotated(GLdouble a,GLdouble b,GLdouble c,GLdouble d){(void)a;(void)b;(void)c;(void)d;}
static inline void glScalef(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glScaled(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glViewport(GLint a,GLint b,GLsizei c,GLsizei d){(void)a;(void)b;(void)c;(void)d;}
static inline void glClear(GLbitfield m){(void)m;}
static inline void glClearColor(GLclampf a,GLclampf b,GLclampf c,GLclampf d){(void)a;(void)b;(void)c;(void)d;}
static inline void glFlush(void){}
static inline void glFinish(void){}
static inline void glPointSize(GLfloat s){(void)s;}
static inline void glLineWidth(GLfloat s){(void)s;}
static inline void glGetIntegerv(GLenum p,GLint*v){(void)p;if(v)*v=0;}
static inline void glGetFloatv(GLenum p,GLfloat*v){(void)p;if(v)*v=0;}
static inline void glGetDoublev(GLenum p,GLdouble*v){(void)p;if(v)*v=0;}
static inline GLenum glGetError(void){return 0;}
static inline void glTexImage2D(GLenum a,GLint b,GLint c,GLsizei d,GLsizei e,GLint f,GLenum g,GLenum h,const GLvoid*i){(void)a;(void)b;(void)c;(void)d;(void)e;(void)f;(void)g;(void)h;(void)i;}
static inline void glTexParameterf(GLenum a,GLenum b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glTexParameteri(GLenum a,GLenum b,GLint c){(void)a;(void)b;(void)c;}
static inline void glTexEnvf(GLenum a,GLenum b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glBindTexture(GLenum a,GLuint b){(void)a;(void)b;}
static inline void glGenTextures(GLsizei n,GLuint*t){for(GLsizei i=0;i<n;i++)t[i]=i+1;}
static inline void glDeleteTextures(GLsizei n,const GLuint*t){(void)n;(void)t;}
static inline GLuint glGenLists(GLsizei n){(void)n;return 1;}
static inline void glNewList(GLuint l,GLenum m){(void)l;(void)m;}
static inline void glEndList(void){}
static inline void glCallList(GLuint l){(void)l;}
static inline void glDeleteLists(GLuint l,GLsizei n){(void)l;(void)n;}
static inline void glPolygonMode(GLenum f,GLenum m){(void)f;(void)m;}
static inline void glShadeModel(GLenum m){(void)m;}
static inline void glBlendFunc(GLenum s,GLenum d){(void)s;(void)d;}
static inline void glDepthMask(GLboolean b){(void)b;}
static inline void glDepthRange(GLclampd a,GLclampd b){(void)a;(void)b;}
static inline void glDrawBuffer(GLenum m){(void)m;}
static inline void glReadBuffer(GLenum m){(void)m;}
static inline void glReadPixels(GLint a,GLint b,GLsizei c,GLsizei d,GLenum e,GLenum f,GLvoid*g){(void)a;(void)b;(void)c;(void)d;(void)e;(void)f;(void)g;}
static inline void glRasterPos2i(GLint a,GLint b){(void)a;(void)b;}
static inline void glRasterPos3d(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glDrawPixels(GLsizei a,GLsizei b,GLenum c,GLenum d,const GLvoid*e){(void)a;(void)b;(void)c;(void)d;(void)e;}
static inline void glPixelStorei(GLenum a,GLint b){(void)a;(void)b;}

static inline void glVertex2fv(const GLfloat*v){(void)v;}
static inline void glVertex2dv(const GLdouble*v){(void)v;}
static inline void glVertex2i(GLint a,GLint b){(void)a;(void)b;}
static inline void glRasterPos2f(GLfloat a,GLfloat b){(void)a;(void)b;}
static inline void glRasterPos2d(GLdouble a,GLdouble b){(void)a;(void)b;}
static inline void glRasterPos3f(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glCallLists(GLsizei n,GLenum t,const GLvoid*l){(void)n;(void)t;(void)l;}
static inline void glListBase(GLuint b){(void)b;}
static inline void glTexCoord2fv(const GLfloat*v){(void)v;}
static inline void glTexCoord2dv(const GLdouble*v){(void)v;}
static inline void glTexCoord3f(GLfloat a,GLfloat b,GLfloat c){(void)a;(void)b;(void)c;}
static inline void glTexCoord3d(GLdouble a,GLdouble b,GLdouble c){(void)a;(void)b;(void)c;}
static inline void glTexCoord3fv(const GLfloat*v){(void)v;}
static inline void glTexCoord3dv(const GLdouble*v){(void)v;}
static inline void glTexGeni(GLenum a,GLenum b,GLint c){(void)a;(void)b;(void)c;}
static inline void glTexGenfv(GLenum a,GLenum b,const GLfloat*c){(void)a;(void)b;(void)c;}
static inline void glTexGendv(GLenum a,GLenum b,const GLdouble*c){(void)a;(void)b;(void)c;}
static inline void glTexEnvi(GLenum a,GLenum b,GLint c){(void)a;(void)b;(void)c;}
static inline void glFrontFace(GLenum m){(void)m;}
static inline void glColor3ub(GLubyte a,GLubyte b,GLubyte c){(void)a;(void)b;(void)c;}
static inline void glColor4ub(GLubyte a,GLubyte b,GLubyte c,GLubyte d){(void)a;(void)b;(void)c;(void)d;}
static inline void glColor3ubv(const GLubyte*v){(void)v;}
static inline void glColor4ubv(const GLubyte*v){(void)v;}
static inline void glAlphaFunc(GLenum f,GLclampf r){(void)f;(void)r;}
static inline void glLightModeli(GLenum p,GLint v){(void)p;(void)v;}
static inline void glDepthFunc(GLenum f){(void)f;}
static inline void glColorMaterial(GLenum a,GLenum b){(void)a;(void)b;}
#ifdef __cplusplus
}
#endif
#endif
